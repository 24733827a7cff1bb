"""Bucketed range/interval join (SURVEY.md B14 range/theta category).

A pure range join (left.ts BETWEEN right.start AND right.end, no equi key)
plans as BroadcastNestedLoopJoin — O(|L|*|R|) and a cluster-killer at scale.
The standard rewrite buckets time into coarse granules: a right interval
covers a contiguous set of buckets, the left point lands in exactly one, so

    explode(right, covered_buckets) JOIN left ON bucket

is an equi-join (hash-partitioned, shuffle on the bucket key) followed by an
exact range refinement.  Cost scales with interval-length/granule, not |L|*|R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "1 day",
    extra_equi: str | None = None,
) -> DataFrame:
    """Join each point row to every interval row containing it
    (start <= point < end), via granule-bucket equi-join + exact refine.

    ``bucket`` granule should be on the order of typical interval length.
    ``extra_equi`` optionally adds a same-named equi key on both sides
    (e.g. a tenant/user column), tightening the join further.
    """
    unit_seconds = _parse_interval_seconds(bucket)

    def bucket_of(c: Column) -> Column:
        # NTZ can't cast to double directly; go through TIMESTAMP (session
        # tz is pinned UTC) -> epoch seconds -> granule index.
        return F.floor(F.unix_seconds(c.cast("timestamp")) / unit_seconds).cast("long")

    p = points.withColumn("_bkt", bucket_of(F.col(point_ts)))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(bucket_of(F.col(start_ts)), bucket_of(F.col(end_ts)))
        ),
    )
    keys = ["_bkt"] + ([extra_equi] if extra_equi else [])
    out = p.join(iv, on=keys).where(
        (F.col(point_ts).cast("timestamp_ntz") >= F.col(start_ts).cast("timestamp_ntz"))
        & (F.col(point_ts).cast("timestamp_ntz") < F.col(end_ts).cast("timestamp_ntz"))
    )
    return out.drop("_bkt")


def _parse_interval_seconds(spec: str) -> int:
    n, unit = spec.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit.lower()]
    return int(n) * mult


def diagnose_skew(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Key-distribution diagnosis: the ``top`` heaviest keys with their share
    of all rows — the pre-flight check before choosing salted vs plain join.

    ONE scan: the total re-enters as a broadcast one-row cross join over
    the per-key counts (pre-r6 this ran a separate ``df.count()`` job,
    scanning the table twice), and the result is a lazy plan like every
    other diagnostic here."""
    counts = df.groupBy(key).agg(F.count("*").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_rows") / F.col("_total"), 4))
        .drop("_total")
        .orderBy(F.desc("n_rows"), F.col(key))
        .limit(top)
    )
