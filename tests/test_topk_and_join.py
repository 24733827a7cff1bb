"""Top-k search (B7), batch similarity join (B8), reranking (B11), IVF (A9)."""

import pytest
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.similarity_join import (
    brute_force_topk_join,
    knn_self_join,
    lsh_topk_join,
)
from vector_search_databricks_poc_spark.operators.topk import rerank, top_k_similar


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def _qv(emb, vec_id=0):
    return list(emb.where(F.col("vec_id") == vec_id).first()["embedding"])


def test_topk_self_is_top_hit(emb):
    hits = top_k_similar(emb, _qv(emb, 3), k=5).collect()
    assert hits[0]["vec_id"] == 3 and hits[0]["score"] == 1.0
    scores = [h["score"] for h in hits]
    assert scores == sorted(scores, reverse=True)
    assert len(hits) == 5


def test_topk_matches_exhaustive(emb):
    """Top-k via limit equals the top slice of a full sorted scoring."""
    q = _qv(emb, 1)
    full = (
        top_k_similar(emb, q, k=emb.count())
        .collect()
    )
    topk = top_k_similar(emb, q, k=7).collect()
    assert [r["vec_id"] for r in topk] == [r["vec_id"] for r in full[:7]]


def test_batch_join_matches_single_queries(emb):
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = brute_force_topk_join(queries, emb, k=3).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        single = top_k_similar(emb, _qv(emb, qid), k=3).collect()
        assert [r["vec_id"] for r in rows] == [s["vec_id"] for s in single]
        assert [r["score"] for r in rows] == [s["score"] for s in single]


def test_rerank_recovers_exact_top(emb):
    """dot-candidates + cosine rerank == direct cosine top-k (on normalized-ish
    data a 50-candidate pool is enough)."""
    q = _qv(emb, 5)
    cands = top_k_similar(emb, q, k=50, metric="dot").select("vec_id")
    cand_vecs = emb.join(F.broadcast(cands), "vec_id", "left_semi")
    two_stage = rerank(cand_vecs, q, k=5).collect()
    direct = top_k_similar(emb, q, k=5).collect()
    assert [r["vec_id"] for r in two_stage] == [r["vec_id"] for r in direct]


def test_knn_self_join_excludes_self(emb):
    out = knn_self_join(emb.limit(50), k=3).collect()
    assert all(r["query_id"] != r["vec_id"] for r in out)
    counts = {}
    for r in out:
        counts[r["query_id"]] = counts.get(r["query_id"], 0) + 1
    assert all(c == 3 for c in counts.values())


def test_lsh_join_recall(emb):
    """LSH candidate pruning keeps most of the true top-3 (recall>=0.6 on
    fixture data with 6 hash tables)."""
    queries = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = brute_force_topk_join(queries, emb, k=3).collect()
    approx = lsh_topk_join(queries, emb, k=3, bucket_length=1.0, num_hash_tables=6).collect()
    exact_pairs = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.6, f"LSH recall {recall}"


def test_ivf_index_recall(spark, emb, tmp_path):
    from vector_search_databricks_poc_spark.operators.index import build_ivf_index

    idx = build_ivf_index(emb, str(tmp_path / "ivf"), k_centroids=8)
    q = _qv(emb, 0)
    exact = {r["vec_id"] for r in top_k_similar(emb, q, k=10).collect()}
    # full probe == exact
    full = {r["vec_id"] for r in idx.search(spark, q, k=10, nprobe=8).collect()}
    assert full == exact
    # partial probe keeps most of the true top-10
    part = {r["vec_id"] for r in idx.search(spark, q, k=10, nprobe=3).collect()}
    assert len(part & exact) >= 6


def test_incremental_refresh(spark, emb, tmp_path):
    from vector_search_databricks_poc_spark.operators.incremental import (
        high_watermark,
        incremental_refresh,
    )
    from vector_search_databricks_poc_spark.operators.index import build_ivf_index

    first_half = emb.where(F.col("vec_id") < 250)
    idx = build_ivf_index(first_half, str(tmp_path / "ivf2"), k_centroids=4)
    assert high_watermark(spark, idx.path) == 249
    n = incremental_refresh(spark, idx, emb)
    assert n == emb.count() - 250
    assert spark.read.parquet(idx.path).count() == emb.count()
    # idempotent: second refresh adds nothing
    assert incremental_refresh(spark, idx, emb) == 0
