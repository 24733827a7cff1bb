"""Event-time windowing, batch and streaming (SURVEY.md B20).

The reference has no streaming at all (its only incremental behavior is the
TRIGGERED index sync, syntetic_data.py:101); the events fixture mandates the
standard event-time surface.  Each operator has a **batch** form (runs on a
static DataFrame — oracle-checkable) and a **streaming** form (same logic on
a readStream source with a watermark); the pytest suite asserts
batch/streaming equivalence by replaying the events table through a
file-source stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    ts_col: str = "ts") -> DataFrame:
    """Tumbling event-time window aggregate; works on batch or streaming
    input unchanged."""
    return (
        events.groupBy(F.window(ts_col, width).alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes",
                   ts_col: str = "ts") -> DataFrame:
    return (
        events.groupBy(F.window(ts_col, width, slide).alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "n_events")
    )


def session_windows_batch(events: DataFrame, gap_minutes: int = 30,
                          ts_col: str = "ts", key_col: str = "user_id",
                          tiebreak_col: str = "event_id") -> DataFrame:
    """Batch sessionization: a new session starts when the gap from the
    previous event EXCEEDS ``gap_minutes`` (strict >: two events exactly
    gap apart stay in one session, which is what Spark's native
    ``session_window`` does — its windows merge when the next event's
    start touches the previous window's end; boundary equivalence is
    pinned in tests/test_review_fixes_r4.py); session id = running count
    of session starts (classic lag + cumulative-sum rewrite, fully
    SQL-expressible so the oracle can check it)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    # microsecond precision: cast("long") truncates to whole seconds, so a
    # gap of 1800.4s read as 1800 would NOT split while native
    # session_window (exact timestamps) does — and the DuckDB oracle's
    # fractional epoch() would disagree the other way
    gap = F.unix_micros(F.col(ts_col)) - F.lag(F.unix_micros(F.col(ts_col))).over(w)
    starts = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    with_sess = events.withColumn("_new_sess", starts).withColumn(
        "session_seq", F.sum("_new_sess").over(w)
    )
    return (
        with_sess.groupBy(key_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def session_windows_streaming(events: DataFrame, gap: str = "30 minutes",
                              watermark: str = "10 minutes",
                              ts_col: str = "ts", key_col: str = "user_id") -> DataFrame:
    """Streaming sessionization with Spark's native session_window + a
    watermark bounding state."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("session_start"), key_col, "n_events")
    )


def streaming_tumbling_counts(events_stream: DataFrame, width: str = "1 hour",
                              watermark: str = "10 minutes", ts_col: str = "ts") -> DataFrame:
    """Watermarked tumbling aggregate: late rows beyond the watermark are
    dropped, state is bounded — the scale contract for infinite streams."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, width).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events")
    )


def streaming_dedup(events_stream: DataFrame, keys: list[str],
                    watermark: str = "10 minutes", ts_col: str = "ts") -> DataFrame:
    """Streaming exact dedup with bounded state
    (dropDuplicatesWithinWatermark)."""
    return events_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
