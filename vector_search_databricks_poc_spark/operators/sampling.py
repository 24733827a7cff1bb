"""Sampling & splitting operators for training-data pipelines.

A 100 TB corpus is never consumed whole: pipelines need deterministic
train/val/test splits (stable across reruns and engines — no RNG), seeded
stratified sampling, and per-group caps.  All are single-pass, shuffle-free
or one-shuffle DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# large odd multiplier scrambles sequential ids; pure arithmetic so ANY
# engine (and the DuckDB oracle) reproduces the exact assignment
_MIX = 2654435761  # Knuth multiplicative hash constant
_P31 = 2147483647  # Mersenne prime 2^31-1; all bucket math is mod-P31


def portable_id_key(id_col: str | Column) -> Column:
    """int64-safe numeric key for an id of ANY type, engine-portable.

    Numeric ids (or numeric strings) reduce mod 2^31-1 BEFORE the
    multiplicative mix, so ``key * _MIX`` can never overflow int64 (the
    raw ``id * _MIX`` form overflowed for ids above ~3.5e9 — an ANSI-mode
    crash and a portability break).  ``(id mod P) * MIX mod P == id * MIX
    mod P``, so every bucket assignment for in-range ids is unchanged.

    Non-numeric ids (arXiv '1234.5678v1' style strings) fall back to the
    portable polynomial string hash — previously they cast to NULL and
    silently emptied both sides of train_test_split / collapsed every
    packing group onto one shard.  DuckDB twin: ``COALESCE(pmod(TRY_CAST(id
    AS BIGINT), P), <polynomial fold>)``.
    """
    from .dedup import portable_string_hash

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.coalesce(
        F.pmod(c.try_cast("long"), F.lit(_P31)),
        portable_string_hash(c.cast("string")),
    )


def split_bucket(id_col: str | Column, buckets: int = 100) -> F.Column:
    """Deterministic engine-portable bucket in [0, buckets): multiplicative
    mix of the id modulo a Mersenne prime, then modulo buckets."""
    return F.pmod(
        F.pmod(portable_id_key(id_col) * F.lit(_MIX), F.lit(_P31)),
        F.lit(buckets),
    )


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.2, buckets: int = 100
) -> tuple[DataFrame, DataFrame]:
    """Deterministic split: same row lands in the same side on every run,
    any cluster size, any engine.

    Guards (review r4): a fraction outside (0, 1) raises instead of
    silently emptying a side; a fraction that rounds to zero buckets
    keeps ONE test bucket rather than an empty test set; rows whose id is
    NULL land in TRAIN (matching the oracle's CASE ... ELSE 'train') —
    previously they satisfied neither bucket predicate and vanished from
    both sides."""
    if not 0.0 < test_fraction < 1.0:
        raise ValueError(f"test_fraction must be in (0, 1), got {test_fraction}")
    cut = max(1, int(round(test_fraction * buckets)))
    b = split_bucket(id_col, buckets)
    return df.where((b >= cut) | b.isNull()), df.where(b < cut)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (seeded; rows-only checkable — the
    RNG is engine-local)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def cap_per_group(
    df: DataFrame, group_col: str, n: int, order_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """At most ``n`` rows per group, deterministic keeper order — the
    'max N documents per domain' de-biasing step.

    Pass ``tiebreak_col`` (a unique id) whenever ``order_col`` can repeat:
    row_number over a tied ordering resolves by partition arrival order,
    which varies across runs and cluster sizes — with the tiebreaker the
    kept set is reproducible anywhere.
    """
    order = [F.col(order_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
