"""Hybrid search (BM25 + vector RRF) semantics."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.hybrid import (
    bm25_scores,
    hybrid_search,
    rrf_fuse,
)


def test_bm25_prefers_term_rich_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark spark engine"),
            Row(doc_id=2, text="spark engine engine engine"),
            Row(doc_id=3, text="flink only here nothing"),
        ]
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark"]).collect()}
    assert set(out) == {1, 2}  # doc 3 has no query term
    assert out[1] > out[2]  # higher tf wins at equal length


def test_bm25_idf_downweights_common_terms(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="common filler words here") for i in range(1, 10)]
        + [Row(doc_id=10, text="rare common filler words")]
    )
    out = bm25_scores(docs, ["rare", "common"]).collect()
    scores = {r["doc_id"]: r["bm25"] for r in out}
    # doc 10 has both; the 'rare' term must dominate its score
    only_common = scores[1]
    assert scores[10] > 2 * only_common


def test_rrf_fusion_rewards_agreement(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, r int")
    b = spark.createDataFrame([(2, 1), (1, 2), (9, 3)], "doc_id long, r int")
    out = rrf_fuse([a, b], rank_cols=["r", "r"], k=4).collect()
    order = [r["doc_id"] for r in out]
    # docs 1 and 2 appear in both rankings -> above 3 and 9
    assert set(order[:2]) == {1, 2}


def test_hybrid_on_fixtures(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    vecs = load_table(spark, sf_dir, "embeddings")
    qv = list(vecs.where(F.col("vec_id") == 0).first()["embedding"])
    out = hybrid_search(docs, vecs, ["vector", "join"], qv, k=10, pool=50).collect()
    assert len(out) == 10
    scores = [r["rrf"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # doc 0 is the vector query itself -> rank_vec 1 -> should surface
    assert 0 in {r["doc_id"] for r in out}
