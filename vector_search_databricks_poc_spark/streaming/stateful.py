"""Custom stateful streaming operator (SURVEY.md B20/B22):
``applyInPandasWithState`` — the escape hatch when built-in streaming
aggregates can't express the state machine.

Example operator: per-user running session stats (event count + running
value total + last event time), emitted on every micro-batch update and
expired via event-time timeout once the user goes quiet past the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def running_user_stats(
    events_stream: DataFrame,
    watermark: str = "10 minutes",
    timeout_minutes: int = 30,
) -> DataFrame:
    """Watermarked per-user running aggregate with explicit state.

    State is bounded two ways: the watermark bounds which rows arrive, and
    the event-time timeout drops state for users idle past
    ``timeout_minutes`` — the discipline any custom stateful op needs to
    survive an unbounded stream.
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            # user idle past the timeout: emit the final state and free it
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "last_ts": pd.to_datetime([None]),
                }
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        state.update((n, total))
        state.setTimeoutTimestamp(
            state.getCurrentWatermarkMs() + timeout_minutes * 60 * 1000
        )
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 2)],
                # to_datetime keeps the column datetime64 even when empty/None
                "last_ts": pd.to_datetime([last_ts]),
            }
        )

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
