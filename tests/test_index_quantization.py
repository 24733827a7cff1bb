"""IVF batch search and int8 quantization (scale-path features)."""

import pytest
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.similarity_join import (
    brute_force_topk_join,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_ivf_batch_search_recall(spark, emb, tmp_path):
    from vector_search_databricks_poc_spark.operators.index import build_ivf_index

    idx = build_ivf_index(emb, str(tmp_path / "ivfb"), k_centroids=8)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = brute_force_topk_join(queries, emb, k=5).collect()
    exact_pairs = {(r["query_id"], r["vec_id"]) for r in exact}

    # full probe recovers the exact result
    full = idx.batch_search(spark, queries, k=5, nprobe=8).collect()
    full_pairs = {(r["query_id"], r["vec_id"]) for r in full}
    assert full_pairs == exact_pairs

    # partial probe keeps most of it
    part = idx.batch_search(spark, queries, k=5, nprobe=3).collect()
    part_pairs = {(r["query_id"], r["vec_id"]) for r in part}
    recall = len(part_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.7, recall

    # every query found itself as top hit in the full probe
    tops = {r["query_id"]: r["vec_id"] for r in full if r["rank"] == 1}
    assert all(qid == vid for qid, vid in tops.items())


def test_recall_report_monotone_and_exact_at_full_probe(spark, emb, tmp_path):
    """The recall grid: non-decreasing in nprobe for every method; plain
    IVF at full probe (nprobe == k_centroids) recovers the exact top-k
    (recall 1.0); raw quantized IVF-PQ ordering is lossy by design, and
    the production shape (fetch 4k by ADC, exact rerank) recovers most of
    the loss at full probe."""
    from vector_search_databricks_poc_spark.operators.evaluate import recall_report

    rep = recall_report(
        spark, emb, str(tmp_path / "rr"), n_queries=8, k=10,
        k_centroids=4, nprobes=(1, 2, 4),
    ).collect()
    by_method = {}
    for r in rep:
        by_method.setdefault(r.method, []).append((r.nprobe, r.recall))
    assert set(by_method) == {
        "ivf", "ivf_pq", "ivf_pq_rerank", "graph", "binary", "pca",
    }
    for method, rows in by_method.items():
        rows.sort()
        recalls = [rc for _, rc in rows]
        # graph/ADC legs can reorder at the margin (beam truncation /
        # quantization noise); exact-scoring IVF is strictly monotone,
        # and the compressed rungs' candidate sets are nested in
        # over_fetch so they are exactly non-decreasing too
        slack = 0.0 if method in ("ivf", "binary", "pca") else 0.05
        assert all(b >= a - slack for a, b in zip(recalls, recalls[1:])), (
            method, rows,
        )
        assert all(0 <= rc <= 1 for rc in recalls)
    assert dict(by_method["ivf"])[4] == 1.0
    assert dict(by_method["ivf_pq"])[4] >= 0.2
    assert dict(by_method["ivf_pq_rerank"])[4] >= 0.7  # fetch_mult=8 curve
    assert dict(by_method["ivf_pq_rerank"])[4] >= dict(by_method["ivf_pq"])[4]
    assert dict(by_method["graph"])[4] >= 0.9  # exact scores, wide beam


def test_hard_negative_mining_excludes_positives(spark, emb, tmp_path):
    """Mined negatives never include a query's positives, are exactly
    k_neg per query (full probe over a dense corpus), are ranked by
    descending score, and are the TOP-scoring non-positives (the self-hit,
    score 1.0, is the planted positive that must be skipped)."""
    from vector_search_databricks_poc_spark.operators.evaluate import (
        hard_negative_mining,
    )
    from vector_search_databricks_poc_spark.operators.index import build_ivf_index

    idx = build_ivf_index(emb, str(tmp_path / "hn"), k_centroids=4)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    positives = queries.select("query_id", F.col("query_id").alias("vec_id"))
    out = hard_negative_mining(
        spark, idx, queries, positives, k_neg=4, nprobe=4
    ).collect()
    by_q = {}
    for r in out:
        assert r.vec_id != r.query_id  # positive excluded
        by_q.setdefault(r.query_id, []).append((r.neg_rank, r.score))
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rows in by_q.items():
        rows.sort()
        assert [rk for rk, _ in rows] == [1, 2, 3, 4]
        scores = [s for _, s in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s < 1.0 for s in scores)  # self-hit (1.0) was skipped


def test_quantization_roundtrip_error(spark, emb):
    from vector_search_databricks_poc_spark.functions.quantization import (
        dequantize,
        quantize_table,
    )
    from vector_search_databricks_poc_spark import vectors as V

    q = quantize_table(emb.select("vec_id", "embedding"))
    assert dict(q.dtypes)["q_vec"] == "array<tinyint>"
    orig = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    rt = q.select("vec_id", dequantize("q_scale", "q_vec").alias("rt"))
    err = (
        orig.join(rt, "vec_id")
        .select(V.l2_distance("v", "rt").alias("e"), V.l2_norm("v").alias("n"))
        .agg(F.max(F.col("e") / F.col("n")).alias("rel"))
        .first()["rel"]
    )
    assert err < 0.02, err  # <2% relative L2 error


def test_quantized_dot_vs_exact(spark, emb):
    from vector_search_databricks_poc_spark.functions.quantization import (
        quantize_table,
        quantized_dot,
    )
    from vector_search_databricks_poc_spark import vectors as V

    q = quantize_table(emb.select("vec_id", "embedding")).where(F.col("vec_id") < 50)
    a = q.select(
        F.col("vec_id").alias("ida"), F.col("q_scale").alias("sa"), F.col("q_vec").alias("qa")
    )
    b = q.select(
        F.col("vec_id").alias("idb"), F.col("q_scale").alias("sb"), F.col("q_vec").alias("qb")
    )
    pairs = a.join(b, F.col("ida") < F.col("idb"))
    approx = pairs.select("ida", "idb", quantized_dot("sa", "qa", "sb", "qb").alias("qd"))
    orig = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    exact = (
        orig.select(F.col("vec_id").alias("ida"), F.col("v").alias("va"))
        .join(orig.select(F.col("vec_id").alias("idb"), F.col("v").alias("vb")), F.col("ida") < F.col("idb"))
        .select("ida", "idb", V.dot("va", "vb").alias("d"), (V.l2_norm("va") * V.l2_norm("vb")).alias("nn"))
    )
    joined = approx.join(exact, ["ida", "idb"])
    worst = joined.agg(F.max(F.abs(F.col("qd") - F.col("d")) / F.col("nn")).alias("w")).first()["w"]
    assert worst < 0.05, worst  # quantized dot within 5% of exact (normalized)


def test_quantized_topk_ranking_agrees(spark, emb):
    """Top-10 by quantized dot ~= top-10 by exact cosine on unit-ish data:
    at least 8/10 overlap (the rerank stage recovers the rest)."""
    from vector_search_databricks_poc_spark.functions.quantization import (
        quantize_table,
        quantized_dot,
    )
    from vector_search_databricks_poc_spark.operators.topk import top_k_similar

    qv_row = emb.where(F.col("vec_id") == 0).first()
    exact = {r["vec_id"] for r in top_k_similar(emb, list(qv_row["embedding"]), k=10).collect()}
    qt = quantize_table(emb.select("vec_id", "embedding"))
    qrow = qt.where(F.col("vec_id") == 0).first()
    qlit = F.array(*[F.lit(int(x)).cast("tinyint") for x in qrow["q_vec"]])
    approx = (
        qt.select(
            "vec_id",
            quantized_dot(F.lit(float(qrow["q_scale"])), qlit, "q_scale", "q_vec").alias("s"),
        )
        .orderBy(F.desc("s"), "vec_id")
        .limit(10)
        .collect()
    )
    overlap = exact & {r["vec_id"] for r in approx}
    assert len(overlap) >= 8, (exact, approx)


def test_index_persistence_roundtrip(spark, sf_dir, tmp_path):
    """An index built in one session is probeable from a handle
    reconstructed purely from disk (_meta rides under the table path,
    invisible to the parquet scan)."""
    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.operators.index import (
        build_ivf_index,
        build_ivf_pq_index,
        load_index,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qv = list(e.where(F.col("vec_id") == 2).first()["embedding"])

    idx = build_ivf_index(e, str(tmp_path / "ivf"), k_centroids=4)
    orig = [(r["vec_id"], r["score"]) for r in idx.search(spark, qv, k=5).collect()]
    reloaded = load_index(spark, str(tmp_path / "ivf"))
    back = [(r["vec_id"], r["score"]) for r in reloaded.search(spark, qv, k=5).collect()]
    assert back == orig
    # the parquet scan still sees only data rows (no _meta leakage)
    assert spark.read.parquet(idx.path).count() == e.count()

    pq = build_ivf_pq_index(e, str(tmp_path / "pq"), k_centroids=4, pq_m=16, pq_k=16)
    orig_pq = [
        (r["vec_id"], r["score"])
        for r in pq.search(spark, qv, source=e, k=5, nprobe=4).collect()
    ]
    re_pq = load_index(spark, str(tmp_path / "pq"))
    back_pq = [
        (r["vec_id"], r["score"])
        for r in re_pq.search(spark, qv, source=e, k=5, nprobe=4).collect()
    ]
    assert back_pq == orig_pq
