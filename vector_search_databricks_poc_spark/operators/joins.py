"""Join strategy helpers for scale (SURVEY.md B14, §4.3).

Catalyst picks good joins when the stats are visible; these helpers cover
the two cases where the engine must decide for it:

- **bucketed co-located joins**: both fact tables written bucketed+sorted on
  the join key join with ZERO exchange — the pattern for repeated big-big
  joins (fact-to-fact at 100 TB);
- **salted joins**: a hot key (power-law corpora have them) is split across
  ``salt`` sub-keys so one task doesn't receive the whole key's rows.  AQE
  skew-join covers sort-merge cases; salting is the explicit fallback that
  also works for aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Write as a bucketed (+sorted) managed table; two tables bucketed the
    same way join/aggregate on the bucket key with no exchange."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    w = w.sortBy(sort_col or bucket_col)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — plan should contain SortMergeJoin
    with NO Exchange on either side (asserted in tests via plans.audit)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is power-law: the
    skewed side gets a random-but-deterministic salt (hash of a unique-ish
    row fingerprint mod ``salt``), the dim side is exploded ``salt`` ways,
    and the join key becomes (key, salt) — splitting each hot key across
    ``salt`` tasks."""
    salted_left = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)).cast("int")
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_left.join(exploded_dim, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def join_size_stats(
    left: DataFrame, right: DataFrame, on: str
) -> DataFrame:
    """Pre-flight EXACT inner-join sizing without running the join.

    Join output rows = Σ_k n_left(k)·n_right(k); computing it needs only
    the two per-key count tables (one agg each) joined on the key — at
    100 TB that's |distinct keys| rows meeting, not the join's output.
    One row out: (join_rows, matching_keys, max_key_pairs, top_key) — run
    it before a suspect join to catch an accidental many-to-many explosion
    (join_rows orders of magnitude above either input) and to see which
    key would dominate.  When no keys match, join_rows and max_key_pairs
    read as 0 (not NULL) so numeric comparisons against input sizes work;
    top_key alone is NULL.
    """
    lc = left.groupBy(on).agg(F.count(F.lit(1)).alias("_nl"))
    rc = right.groupBy(on).agg(F.count(F.lit(1)).alias("_nr"))
    per_key = lc.join(rc, on).select(
        F.col(on), (F.col("_nl") * F.col("_nr")).alias("_pairs")
    )
    return per_key.agg(
        F.coalesce(F.sum("_pairs"), F.lit(0)).alias("join_rows"),
        F.count(F.lit(1)).alias("matching_keys"),
        F.coalesce(F.max("_pairs"), F.lit(0)).alias("max_key_pairs"),
        F.max_by(F.col(on), F.struct(F.col("_pairs"), F.col(on))).alias("top_key"),
    ).select(
        "join_rows", "matching_keys", "max_key_pairs", "top_key"
    )
