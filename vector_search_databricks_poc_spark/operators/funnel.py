"""Event analytics: ordered funnels and cohort retention.

Spark has no MATCH_RECOGNIZE; the strictly-ordered funnel ("users who did
A, then B after A, then C after B") decomposes into one aggregate per step:
step i's timestamp is min(ts | type = step_i AND ts > t_{i-1}), carried
forward per user.  Each step costs one shuffle on the user key (the join
back to the previous step's times reuses the same key, so AQE/exchange
reuse keeps the steps co-partitioned); k funnel steps = k aggregates over
a progressively SHRINKING user set — at 100 TB the step-1 filter prunes
the scan to the step event types, and later steps touch only converting
users' rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_user_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user earliest completion time of each funnel step, strictly
    ordered (step i must occur after the user's step-(i-1) time).

    Returns (user_col, t1..tk): t_i is NULL from the first step the user
    never completed in order.  Earliest-completion semantics: each t_i is
    the minimum qualifying timestamp, which makes the result deterministic
    and gives every later step the loosest possible constraint.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    relevant = events.where(F.col(type_col).isin(list(steps))).select(
        user_col, type_col, ts_col
    )
    out = (
        relevant.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i-1}"
        nxt = (
            relevant.where(F.col(type_col) == step)
            .join(out.select(user_col, prev), user_col)
            .where(F.col(ts_col) > F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        out = out.join(nxt, user_col, "left")
    return out


def funnel_conversions(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel summary: one row per step with the step name, users reaching
    it in order, and conversion rate vs step 1 — the report shape every
    event-analytics funnel produces."""
    times = funnel_user_times(events, steps, user_col, type_col, ts_col)
    counts = times.agg(
        *[F.count(f"t{i}").alias(f"_n{i}") for i in range(1, len(steps) + 1)]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step"),
                        F.lit(steps[i - 1]).alias("event_type"),
                        F.col(f"_n{i}").alias("n_users"),
                        F.round(
                            F.col(f"_n{i}")
                            / F.when(F.col("_n1") > 0, F.col("_n1")).cast("double"),
                            6,
                        ).alias("conversion"),
                    )
                    for i in range(1, len(steps) + 1)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.step", "r.event_type", "r.n_users", "r.conversion").orderBy(
        "step"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    period; for each cohort and period offset k, how many (and what
    fraction) were active k periods later.

    Periods are fixed ``period_days`` windows anchored at each user's data,
    truncated from a fixed epoch day so the bucketing is engine-portable
    (DuckDB reproduces it with the same integer arithmetic — no
    locale-dependent week truncation).  Cost: one agg on user (first
    activity), one distinct on (user, period), one same-key join, one agg
    on (cohort, offset) — all single-shuffle steps on keys that shrink as
    they go.  Returns (cohort_day, period_offset, n_active, cohort_size,
    retention) with retention = n_active / cohort_size.
    """
    day = F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date"))
    period = F.floor(day / period_days)
    ap = events.select(
        F.col(user_col), period.alias("_p")
    ).distinct()
    first = ap.groupBy(user_col).agg(F.min("_p").alias("_cohort"))
    sizes = first.groupBy("_cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    ret = (
        ap.join(first, user_col)
        .groupBy(
            F.col("_cohort"),
            (F.col("_p") - F.col("_cohort")).alias("period_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
    )
    return (
        ret.join(F.broadcast(sizes), "_cohort")
        .select(
            F.date_add(F.lit("1970-01-01").cast("date"), (F.col("_cohort") * period_days).cast("int")).alias(
                "cohort_day"
            ),
            "period_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_day", "period_offset")
    )
