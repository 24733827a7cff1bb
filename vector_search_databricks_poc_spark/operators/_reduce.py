"""Scalable elementwise reduction of per-partition array partials.

Fit-style operators (PCA sufficient statistics, binary-quantization
mean) reduce the corpus to a handful of d- or d^2-sized vectors.  The
naive merge — ``F.aggregate(F.collect_list(arr), ...)`` — concentrates
EVERY partial into one aggregation buffer and folds them single-threaded
on one reducer: at 1e10 rows the PCA Gram partials alone are tens of GB
in a single agg buffer.  This module is the scale-correct alternative:

explode each partial array to ``(column, index, value)`` rows and let a
plain hash aggregate ``SUM`` per ``(column, index)``.  Map-side partial
combine means each task emits at most ``1 + sum(d_c)`` rows after local
aggregation regardless of its input size, the shuffle moves only
``tasks x keys`` tiny rows, and the per-index sums reduce fully in
parallel — a native tree reduction with no ``collect_list`` buffer and
no driver concentration beyond the ``1 + sum(d_c)`` result rows
themselves.

All columns fan out of ONE select (a concat of per-column struct arrays
plus the row-count pseudo-column -1, exploded once): Spark does not
deduplicate identical subtrees across union branches, so the earlier
one-branch-per-column union re-ran the upstream scan — and, for the PCA
fit, the O(n*d^2) pandas Gram partials — once per branch (ADVICE r8).
The single-select shape scans the source exactly once and keeps the
whole reduction ONE job / ONE shuffle for real.  Sums travel as
doubles; counts up to 2^53 stay exact (1e10 rows is 5 orders of
magnitude inside that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sum_partials"]


def _stacked(parts: DataFrame, array_cols: list[str]) -> DataFrame:
    """The pre-collect plan: one select over ``parts`` emitting every
    ``(_c, _i, _x)`` triple — per-column array elements tagged with the
    column ordinal, plus ``(-1, 0, n)`` for the row count — then the
    partial+final hash aggregate.  Split out so tests can assert the
    single-scan plan shape."""

    def _branch(ci: int, c: str) -> Column:
        def tag(x: Column, i: Column) -> Column:
            return F.struct(
                F.lit(ci).alias("_c"), i.alias("_i"), x.alias("_x")
            )

        return F.transform(
            F.coalesce(F.col(c), F.array().cast("array<double>")), tag
        )

    n_branch = F.array(
        F.struct(
            F.lit(-1).alias("_c"),
            F.lit(0).alias("_i"),
            F.col("n").cast("double").alias("_x"),
        )
    )
    combined = F.concat(
        *[_branch(ci, c) for ci, c in enumerate(array_cols)], n_branch
    )
    return (
        parts.select(F.explode(combined).alias("s"))
        .groupBy(F.col("s._c").alias("_c"), F.col("s._i").alias("_i"))
        .agg(F.sum("s._x").alias("_x"))
    )


def sum_partials(parts: DataFrame, array_cols: list[str]) -> tuple[int, dict]:
    """Eagerly reduce a frame of per-partition partials.

    ``parts`` must have a ``n`` (long) row-count column plus the named
    ``array<double>`` partial-sum columns (constant length within a
    column).  Returns ``(total_n, {col: list[float]})`` with each list
    the elementwise sum across all partials; a column whose partials are
    all absent (zero input rows) comes back as an empty list.

    Eager by contract: callers are fit operators (KMeans/CREATE INDEX
    analogs) whose result is corpus-size-independent.
    """
    rows = _stacked(parts, array_cols).collect()

    total_n = 0
    by_col: dict[int, dict[int, float]] = {}
    for r in rows:
        if r["_c"] == -1:
            total_n = int(r["_x"])
        else:
            by_col.setdefault(r["_c"], {})[r["_i"]] = float(r["_x"])
    out = {}
    for ci, c in enumerate(array_cols):
        vals = by_col.get(ci, {})
        out[c] = [vals[i] for i in sorted(vals)]
    return total_n, out
