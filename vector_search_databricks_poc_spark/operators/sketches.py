"""Mergeable sketch profiling: per-shard HyperLogLog sketches, unioned
incrementally.

Exact COUNT(DISTINCT) over 100 TB is a full shuffle of every distinct
value; the sketch pattern replaces it with a scan that emits one ~KB HLL
sketch per shard, unioned in O(shards) — and because HLL merge is
commutative/associative/idempotent, the per-shard sketches can be
PERSISTED next to the data and re-unioned whenever new shards land,
giving incremental cardinality profiles without ever re-reading old data
(Datasketches HLL via Spark's hll_sketch_agg/hll_union_agg builtins;
deterministic for a given input multiset).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def shard_sketches(
    df: DataFrame, shard_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch of ``value_col`` per shard — the persistable profile
    artifact (binary ``sketch`` column + exact per-shard row count)."""
    return df.groupBy(shard_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.count(value_col).alias("n_rows"),
    )


def union_estimate(sketches: DataFrame) -> DataFrame:
    """Union per-shard sketches into the global cardinality estimate.
    O(shards) rows in, one row out — no touch of the base data."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate"),
        F.sum("n_rows").alias("n_rows"),
    )


def sketch_profile(
    df: DataFrame, cols: list[str], shard_col: str, lg_k: int = 12
) -> DataFrame:
    """Cardinality profile of ``cols``: exact distinct vs the
    shard-sketch-union estimate and its relative error — the accuracy
    audit run at small scale before trusting sketches at 100 TB."""
    legs = []
    for c in cols:
        est = union_estimate(shard_sketches(df, shard_col, c, lg_k)).select(
            F.lit(c).alias("col"),
            F.col("estimate"),
            F.col("n_rows"),
        )
        exact = df.agg(F.count_distinct(F.col(c)).alias("exact"))
        legs.append(est.join(F.broadcast(exact)))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.select(
        "col",
        "exact",
        "estimate",
        F.round((F.col("estimate") - F.col("exact")) / F.col("exact"), 4).alias(
            "rel_err"
        ),
        "n_rows",
    )


def frequent_item_candidates(
    df: DataFrame, key_col: str, counters: int = 256
) -> DataFrame:
    """Per-partition Misra–Gries summaries: candidate frequent keys with
    lower-bound counts, ≤ ``counters`` rows per partition.

    The summary is built batch-at-a-time with vectorized pandas ops
    (``value_counts`` + the mergeable-summaries reduction: subtract the
    (k+1)-th largest counter, keep positives — Agarwal et al., "Mergeable
    Summaries", PODS 2012), never a per-row Python loop.  Guarantee: every
    key whose count within a partition exceeds n_part/(counters+1) survives
    that partition's summary, so the union over partitions is a superset of
    all keys with global frequency > n/(counters+1).  Null keys are not
    counted as items.
    """
    key_field = df.schema[key_col]
    out_schema = T.StructType(
        [key_field, T.StructField("lb", T.LongType(), nullable=False)]
    )

    def mg(batches):
        import pandas as pd

        s = None
        for pdf in batches:
            vc = pdf[key_col].value_counts(dropna=True)
            s = vc if s is None else s.add(vc, fill_value=0)
            if len(s) > counters:
                kth = s.nlargest(counters + 1).iloc[-1]
                s = s[s > kth] - kth
        if s is None or s.empty:
            return
        yield pd.DataFrame({key_col: s.index, "lb": s.to_numpy().astype("int64")})

    return df.select(key_col).mapInPandas(mg, schema=out_schema)


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold_frac: float = 0.01,
    counters: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters (keys with frequency ≥ threshold_frac · n) via the
    2-pass candidate/recount pattern.

    Pass 1 scans once and emits ≤ counters keys per partition (Misra–Gries,
    no shuffle).  Pass 2 recounts ONLY candidate keys: the broadcast
    left-semi join filters rows map-side, so the groupBy's partial-aggregate
    hash tables and the shuffle carry candidate keys instead of the full key
    domain — at 100 TB with a high-cardinality key that is the difference
    between shuffling |candidates| ≈ counters × partitions entries and
    shuffling every distinct key.  ``counters`` is raised to
    ceil(1/threshold_frac) when smaller so the candidate set provably
    contains every true heavy hitter, making the result exact and
    SQL-oracle-checkable (GROUP BY … HAVING count ≥ ceil(f · n)).

    The total row count rides along as a broadcast one-row cross join — the
    whole operator is one lazy plan, no driver-side action.
    """
    k = max(int(math.ceil(1.0 / threshold_frac)), 1)
    counters = max(counters or 0, k)
    cands = frequent_item_candidates(df, key_col, counters).select(key_col).distinct()
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    counted = (
        df.join(F.broadcast(cands), on=key_col, how="left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.join(F.broadcast(total))
        .where(
            F.col("cnt")
            >= F.ceil(F.col("_n") * F.lit(float(threshold_frac))).cast("long")
        )
        .select(key_col, "cnt")
        .orderBy(F.col("cnt").desc(), F.col(key_col))
    )
