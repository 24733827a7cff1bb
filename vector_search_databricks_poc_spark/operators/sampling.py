"""Sampling & splitting operators for training-data pipelines.

A 100 TB corpus is never consumed whole: pipelines need deterministic
train/val/test splits (stable across reruns and engines — no RNG), seeded
stratified sampling, and per-group caps.  All are single-pass, shuffle-free
or one-shuffle DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# large odd multiplier scrambles sequential ids; pure arithmetic so ANY
# engine (and the DuckDB oracle) reproduces the exact assignment
_MIX = 2654435761  # Knuth multiplicative hash constant (fits in int64 math)


def split_bucket(id_col: str, buckets: int = 100) -> F.Column:
    """Deterministic engine-portable bucket in [0, buckets): multiplicative
    mix of the id modulo a Mersenne prime, then modulo buckets."""
    return F.pmod(
        F.pmod(F.col(id_col).cast("long") * F.lit(_MIX), F.lit(2147483647)),
        F.lit(buckets),
    )


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.2, buckets: int = 100
) -> tuple[DataFrame, DataFrame]:
    """Deterministic split: same row lands in the same side on every run,
    any cluster size, any engine."""
    cut = int(round(test_fraction * buckets))
    b = split_bucket(id_col, buckets)
    return df.where(b >= cut), df.where(b < cut)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (seeded; rows-only checkable — the
    RNG is engine-local)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def cap_per_group(
    df: DataFrame, group_col: str, n: int, order_col: str
) -> DataFrame:
    """At most ``n`` rows per group, deterministic keeper order — the
    'max N documents per domain' de-biasing step."""
    w = Window.partitionBy(group_col).orderBy(F.col(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
