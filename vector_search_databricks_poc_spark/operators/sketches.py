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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
