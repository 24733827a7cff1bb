"""Batch similarity join: many queries x corpus, top-k per query (SURVEY.md B8).

The reference serves one query at a time through the index service
(query_endpoint.py:122-150).  The batch-analytics rendition is a join:

- **Broadcast brute-force** (exact; the oracle-checkable path): broadcast the
  small query side against the corpus, score with the Catalyst expression
  kernel, rank per query with a window.  At 100 TB the corpus side stays
  partitioned and never shuffles — the only shuffle is the per-query-id
  ranking, whose input is already cut to corpus_rows x n_queries scored pairs;
  prune first (LSH/IVF below) when n_queries is large.
- **LSH-pruned** (approximate; the scale path): bucket both sides with
  MLlib ``BucketedRandomProjectionLSH`` and only score within-bucket pairs —
  the bucket id becomes a join key, so Spark plans an equi-join instead of a
  cross product, and a bucket-partitioned index table turns the probe into
  partition pruning (SURVEY.md §4.2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import vectors as V
from .topk import METRICS, score_expr


def brute_force_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    score_decimals: int | None = 6,
) -> DataFrame:
    """Exact top-k per query via broadcast cross join + window rank.

    Returns (query_id, id, score, rank) — rank 1..k per query, ties broken
    by corpus id for determinism.
    """
    if metric not in METRICS:
        raise ValueError(f"metric must be one of {METRICS}")
    # Norms are precomputed ONCE per side before the join — at n_queries x
    # corpus scale this turns 2*|pairs| norm traversals into |q|+|corpus|.
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).cast("array<double>").alias("_qv"),
            V.l2_norm(query_vec_col).alias("_qn"),
        )
    )
    c = corpus.select(F.col(id_col), F.col(vec_col), V.l2_norm(vec_col).alias("_cn"))
    if metric == "cosine":
        denom = F.col("_cn") * F.col("_qn")
        score = F.when(denom != 0, V.dot(vec_col, F.col("_qv")) / denom)
    elif metric == "dot":
        score = V.dot(vec_col, F.col("_qv"))
    else:
        score = score_expr(vec_col, F.col("_qv"), metric)
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    scored = (
        c.crossJoin(q)
        .select("query_id", F.col(id_col), score.alias("score"))
        .where(F.col("score").isNotNull() & ~F.isnan("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    metric: str = "cosine",
    score_decimals: int | None = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k per query: LSH candidate generation, exact rescoring.

    Candidate generation is an equi-join on (hash-table, bucket), so the
    corpus is scored only where a query lands in the same bucket — sub-linear
    work per query at scale.  Recall < 1 by construction; raise
    ``num_hash_tables`` to trade compute for recall.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col), F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_features"),
    )
    qn = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_qvec_arr"),
        array_to_vector(F.col(query_vec_col).cast("array<double>")).alias("_features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_features", outputCol="_hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(c)
    ch = model.transform(c)
    qh = model.transform(qn)

    from pyspark.ml.functions import vector_to_array

    # Explode hash tables into (table_idx, bucket) join keys -> pure equi-join.
    def keyed(df: DataFrame) -> DataFrame:
        return df.select(
            "*", F.posexplode("_hashes").alias("_tbl", "_bucket")
        ).withColumn("_bucket", vector_to_array(F.col("_bucket"))[0].cast("long"))

    pairs = (
        keyed(qh)
        .select("query_id", "_qvec_arr", "_tbl", "_bucket")
        .join(
            keyed(ch).select(F.col(id_col), F.col(vec_col), "_tbl", "_bucket"),
            on=["_tbl", "_bucket"],
        )
        .select("query_id", "_qvec_arr", id_col, vec_col)
        .dropDuplicates(["query_id", id_col])
    )
    score = score_expr(vec_col, F.col("_qvec_arr").cast("array<double>"), metric)
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    scored = pairs.select(
        "query_id", F.col(id_col), score.alias("score")
    ).where(F.col("score").isNotNull() & ~F.isnan("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def knn_self_join(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    score_decimals: int | None = 6,
) -> DataFrame:
    """k nearest neighbors of every corpus row (excluding itself) — the
    all-pairs building block behind embedding near-dup detection (B10)."""
    queries = corpus.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    out = brute_force_topk_join(
        queries, corpus, k=k + 1, id_col=id_col, vec_col=vec_col,
        metric=metric, score_decimals=score_decimals,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        out.where(F.col("query_id") != F.col(id_col))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
