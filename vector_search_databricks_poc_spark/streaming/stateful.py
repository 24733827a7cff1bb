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
    ArrayType,
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
        # last event time as epoch-µs; kept IN state so the timeout
        # emission (the final row consumers keep) still carries it, and so
        # a late-but-in-watermark batch can't move the reported value
        # backwards to its own batch max
        StructField("last_ts_us", LongType()),
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
            n, total, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "last_ts": pd.to_datetime(
                        [last_us * 1000 if last_us is not None else None]
                    ),
                }
            )
            return
        n, total, last_us = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max_us = int(pdf["ts"].astype("int64").max()) // 1000
            last_us = batch_max_us if last_us is None else max(last_us, batch_max_us)
        state.update((n, total, last_us))
        # timeout anchored on the LATEST event time (the watermark alone is
        # 0 on the first batch, which would expire everyone immediately on
        # the next); must still exceed the current watermark per the API
        anchor_ms = max(
            state.getCurrentWatermarkMs() + 1,
            (last_us // 1000) if last_us is not None else 0,
        )
        state.setTimeoutTimestamp(anchor_ms + timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 2)],
                # to_datetime keeps the column datetime64 even when empty/None
                "last_ts": pd.to_datetime(
                    [last_us * 1000 if last_us is not None else None]
                ),
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


FUNNEL_STATE_SCHEMA = StructType(
    [StructField("step_ts_us", ArrayType(LongType()))]
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("depth", LongType()),
        StructField("last_step_ts", TimestampType()),
    ]
)


def streaming_funnel_depth(
    events_stream: DataFrame,
    steps: list[str],
    watermark: str = "10 minutes",
    type_col: str = "event_type",
    ts_col: str = "ts",
    timeout_minutes: int = 24 * 60,
) -> DataFrame:
    """Streaming twin of ``operators.funnel.funnel_user_times``: per-user
    funnel depth tracked live with explicit state (the completed steps'
    timestamps, as epoch-µs longs).

    Each micro-batch advances a user at most ``len(steps)`` times: for the
    next uncompleted step, take the MIN qualifying timestamp in the batch
    (vectorized pandas filter per step — no per-row Python loop), append,
    repeat.  With in-order delivery this reproduces the batch operator's
    earliest-completion semantics exactly (asserted on a full-file replay);
    late events older than an already-committed step time cannot retract it
    — the streaming result is conservative under disorder, like any
    append-only funnel tracker.  Output mode is update: the latest row per
    user carries their current depth; depth is monotone, so consumers take
    the max.

    State is bounded: a user idle past ``timeout_minutes`` (event time,
    default 24 h — the conversion-attribution window) has their final
    depth emitted once more and their state expired.  Without this the
    store grows with every user EVER seen — including fully-converted
    users whose depth can never change — and an unbounded user population
    eventually exhausts it.  A user re-appearing after expiry restarts at
    depth 0: the documented recall/memory tradeoff of any bounded tracker.
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            # idle past the attribution window: re-emit the final depth
            # (a no-op for max-depth consumers) and free the state
            times = list(state.get[0])
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "depth": [len(times)],
                    "last_step_ts": pd.to_datetime(
                        [times[-1] * 1000 if times else None]
                    ),
                }
            )
            return
        times = list(state.get[0]) if state.exists else []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # µs since epoch, naive — matches the state encoding
        ts_us = pdf[ts_col].astype("int64") // 1000
        depth = len(times)
        last = times[-1] if times else None
        while depth < len(steps):
            mask = pdf[type_col] == steps[depth]
            if last is not None:
                mask &= ts_us > last
            if not mask.any():
                break
            last = int(ts_us[mask].min())
            times.append(last)
            depth += 1
        state.update((times,))
        # anchor on the batch's latest event time (watermark is 0 on the
        # first batch); must still exceed the current watermark per the API
        anchor_ms = max(
            state.getCurrentWatermarkMs() + 1, int(ts_us.max()) // 1000
        )
        state.setTimeoutTimestamp(anchor_ms + timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "depth": [depth],
                "last_step_ts": pd.to_datetime(
                    [times[-1] * 1000 if times else None]
                ),
            }
        )

    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
