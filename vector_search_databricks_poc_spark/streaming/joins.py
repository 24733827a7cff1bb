"""Stream-stream interval joins (B20): event attribution with bounded state.

The classic streaming join — attribute a conversion event to a prior
trigger event of the same key within a time window (purchase <- signup,
click <- impression).  The batch twin is a plain range join; the streaming
form watermarks BOTH sides and bounds the join condition in event time on
both streams, which is exactly what lets Spark expire join state: a left
row can stop waiting once the right watermark passes ``left_ts``, a right
row once the left watermark passes ``right_ts + upper``.

State size is O(events inside the interval per key), never O(stream
history) — the property that makes this run forever at 100 TB/day.
Batch/stream equivalence is asserted in tests/test_streaming_joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Batch twin: rows of ``left`` joined to same-key ``right`` rows whose
    timestamp falls in ``[left_ts - upper, left_ts]`` (the attribution
    lookback).  Columns are disambiguated with ``l_`` / ``r_`` prefixes."""
    l = left.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c != key],
    )
    r = right.select(
        F.col(key).alias("_rk"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
    )
    # The range condition must live IN the join condition, not a post-join
    # .where(): for outer joins a filter on right-side columns evaluates
    # NULL on the padded rows and silently turns 'left' into 'inner'.
    cond = (
        (F.col("_k") == F.col("_rk"))
        & (F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}"))
        & (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}") - F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, on=cond, how=how).drop("_rk").withColumnRenamed("_k", key)


def stream_interval_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming form of :func:`interval_join`: both sides watermarked, the
    range condition written on both event-time columns so the state store
    can expire rows (Spark rejects stream-stream joins without it)."""
    l = left_stream.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(f"l_{c}") for c in left_stream.columns if c != key],
    ).withWatermark(f"l_{left_ts}", watermark)
    r = right_stream.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(f"r_{c}") for c in right_stream.columns if c != key],
    ).withWatermark(f"r_{right_ts}", watermark)
    cond = (
        (F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}"))
        & (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}") - F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, on=["_k"], how="inner").where(cond).withColumnRenamed("_k", key)


def attribution_report(
    joined: DataFrame,
    trigger_type_col: str = "r_event_type",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
) -> DataFrame:
    """Aggregate an interval-join result into the attribution report: per
    trigger event type, how many conversions it preceded and the mean
    trigger->conversion latency in seconds.  ``left_ts``/``right_ts`` name
    the joined timestamp columns (``l_``/``r_``-prefixed forms of whatever
    the interval join was given — not hardwired to ts='ts')."""
    lat = F.col(left_ts).cast("double") - F.col(right_ts).cast("double")
    return (
        joined.groupBy(F.col(trigger_type_col).alias("trigger_type"))
        .agg(
            F.count("*").alias("n_attributed"),
            F.round(F.avg(lat), 3).alias("avg_latency_s"),
        )
        .orderBy("trigger_type")
    )
