"""As-of (temporal) join — an operator Spark lacks natively (SURVEY.md §2A
absent-categories: range/as-of join).

Semantics (backward, inclusive): for each left row, attach the right row
with the greatest right_ts <= left_ts within the same key — "the latest
known state as of this moment".  The standard scalable Spark rendition is
the **union + last-over-window trick**:

    union(left-tagged, right-tagged)
      -> window per key ordered by (ts, is_left)   [right first on ties]
      -> last(right_payload, ignorenulls) over unbounded-preceding
      -> keep left rows

One shuffle on the key, no per-row subquery, no skew beyond the key's own
distribution — this is how as-of joins scale to 100 TB trade/event tables.
DuckDB has a native ASOF JOIN, which serves as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Backward-inclusive as-of join.

    ``payload``: right columns to attach (default: all but key/ts).
    ``how``: 'inner' drops left rows with no prior right row (DuckDB ASOF
    JOIN default); 'left' keeps them with null payload.

    Determinism contract: callers must ensure at most one right row per
    (key, right_ts) — ties at identical timestamps are arbitrary in every
    as-of implementation (dedupe with max_by first).
    """
    if payload is None:
        payload = [c for c in right.columns if c not in (on, right_ts)]
    lcols = left.columns
    dup = [c for c in payload if c in lcols]
    if dup:
        # the output would carry two columns with the same name — silently
        # ambiguous downstream; make the caller rename or select payload
        raise ValueError(
            f"payload columns {dup} collide with left columns — rename the "
            f"right side or pass an explicit payload list"
        )
    # NULL keys never match in SQL joins (and in DuckDB's ASOF JOIN, the
    # oracle): drop null-key right rows so the window trick can't fill a
    # null-key left row from a 'latest null-key right row' phantom match
    right = right.where(F.col(on).isNotNull())

    # Payload travels as ONE struct (non-null for every right row), so
    # last(ignorenulls) fills all payload columns from the SAME matched
    # right row.  Per-column fills would backfill a NULL payload value from
    # an older right row, mixing columns across rows — DuckDB ASOF JOIN
    # returns the matched row's NULLs as-is, and so do we.
    from pyspark.sql import types as T

    p_struct = T.StructType([T.StructField(c, right.schema[c].dataType) for c in payload])
    l2 = left.select(
        *lcols,
        F.col(left_ts).cast("timestamp_ntz").alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("timestamp_ntz").alias("_rt"),
        F.lit(None).cast(p_struct).alias("_p"),
    )
    r2 = right.select(
        *[
            (F.col(on) if c == on else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.col(right_ts).cast("timestamp_ntz").alias("_t"),
        F.lit(0).alias("_is_left"),
        F.col(right_ts).cast("timestamp_ntz").alias("_rt"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("_p"),
    )
    u = l2.unionByName(r2)
    # right rows sort before left rows at the same timestamp -> inclusive
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *lcols,
        "_is_left",
        F.last("_rt", ignorenulls=True).over(w).alias("_matched_ts"),
        F.last("_p", ignorenulls=True).over(w).alias("_p"),
    )
    filled = filled.select(
        *lcols, "_is_left", "_matched_ts",
        *[F.col(f"_p.{c}").alias(c) for c in payload],
    )
    out = filled.where(F.col("_is_left") == 1).drop("_is_left")
    if how == "inner":
        out = out.where(F.col("_matched_ts").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.drop("_matched_ts")
