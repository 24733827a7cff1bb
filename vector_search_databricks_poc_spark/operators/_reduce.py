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

The row count ``n`` rides along as pseudo-column -1 so the whole
reduction is ONE job / ONE shuffle.  Sums travel as doubles; counts up
to 2^53 stay exact (1e10 rows is 5 orders of magnitude inside that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sum_partials"]


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
    stacked = None
    for ci, c in enumerate(array_cols):
        e = parts.select(
            F.lit(ci).alias("_c"),
            F.posexplode(c).alias("_i", "_x"),
        )
        stacked = e if stacked is None else stacked.unionAll(e)
    n_rows = parts.select(
        F.lit(-1).alias("_c"),
        F.lit(0).alias("_i"),
        F.col("n").cast("double").alias("_x"),
    )
    stacked = n_rows if stacked is None else stacked.unionAll(n_rows)
    rows = stacked.groupBy("_c", "_i").agg(F.sum("_x").alias("_x")).collect()

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
