"""Product quantization: compression, ADC ranking recall vs exact."""

import pytest
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark import vectors as V
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.functions.quantization import PqCodebook
from vector_search_databricks_poc_spark.operators.topk import top_k_similar


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    """L2-normalized corpus — PQ sits behind the index build, which
    normalizes first (operators/index.py); ADC-dot == cosine there."""
    raw = load_table(spark, sf_dir, "embeddings")
    return raw.select(
        "vec_id", "label", V.l2_normalize("embedding").cast("array<float>").alias("embedding")
    ).cache()


@pytest.fixture(scope="module")
def pq(emb):
    # m=16 on 64d: 4 dims/subspace — near-random fixture vectors need the
    # finer grid (real embedding manifolds tolerate coarser m=8)
    return PqCodebook.fit(emb, m=16, k=16)


def test_pq_encode_shape(emb, pq):
    coded = pq.encode(emb)
    row = coded.first()
    assert len(row["pq_code"]) == 16
    assert all(0 <= c < 16 for c in row["pq_code"])
    # deterministic encode
    again = pq.encode(emb)
    assert coded.select("vec_id", "pq_code").exceptAll(
        again.select("vec_id", "pq_code")
    ).count() == 0


def test_pq_reconstruction_error(emb, pq):
    """PQ-reconstructed vectors approximate the originals (relative L2
    error bounded; 64d float -> 8 bytes is lossy but must stay sane)."""
    coded = pq.encode(emb)
    recon_cols = []
    for j in range(pq.m):
        cb = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in pq.centroids[j]])
        recon_cols.append(F.element_at(cb, F.element_at("pq_code", j + 1) + 1))
    recon = coded.withColumn("_recon", F.flatten(F.array(*recon_cols)))
    rel = (
        recon.select(
            (V.l2_distance(F.col("embedding").cast("array<double>"), F.col("_recon"))
             / V.l2_norm("embedding")).alias("rel")
        )
        .agg(F.avg("rel"))
        .first()[0]
    )
    assert rel < 0.8, rel  # random-ish 64d data: lossy but bounded


def test_pq_adc_topk_recall(spark, emb, pq):
    """ADC top-20 must recover most of the exact cosine top-10 (then the
    standard pipeline exact-rescoring of the ADC candidates recovers the
    rest)."""
    qrow = emb.where(F.col("vec_id") == 0).first()
    query = [float(x) for x in qrow["embedding"]]
    exact = {r["vec_id"] for r in top_k_similar(emb, query, k=10).collect()}
    coded = pq.encode(emb)
    adc = (
        coded.select("vec_id", pq.adc_score(query).alias("s"))
        .orderBy(F.desc("s"), "vec_id")
        .limit(50)
        .collect()
    )
    overlap = exact & {r["vec_id"] for r in adc}
    assert len(overlap) >= 6, (sorted(exact), adc)


def test_ivf_pq_search_recall(spark, sf_dir, tmp_path):
    """IVF-PQ composition: partition-pruned probe over the (id, pq_code)
    table, ADC scoring of residuals + per-centroid dot constant, exact
    rerank of rerank_factor*k survivors.  Recall@10 vs exact brute force
    must be high with a meaningful probe fraction, and the index table
    must store no float vectors."""
    from vector_search_databricks_poc_spark.operators.index import build_ivf_pq_index

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = build_ivf_pq_index(
        e, str(tmp_path / "ivfpq"), k_centroids=8, pq_m=16, pq_k=16
    )
    # the stored table is codes only — no embedding column at rest
    stored = spark.read.parquet(idx.path)
    assert set(stored.columns) == {"vec_id", "pq_code", "centroid_id"}

    norm = e.select("vec_id", V.l2_normalize("embedding").alias("embedding"))
    qv = list(e.where(F.col("vec_id") == 5).first()["embedding"])
    exact = {r["vec_id"] for r in top_k_similar(norm, qv, k=10).collect()}

    got_full = {
        r["vec_id"]
        for r in idx.search(spark, qv, source=norm, k=10, nprobe=8, rerank_factor=4).collect()
    }
    assert len(exact & got_full) >= 9, f"all-probe recall too low: {exact & got_full}"

    got_pruned = {
        r["vec_id"]
        for r in idx.search(spark, qv, source=norm, k=10, nprobe=4, rerank_factor=4).collect()
    }
    assert len(exact & got_pruned) >= 6, f"nprobe=4 recall too low: {exact & got_pruned}"
    assert 5 in got_pruned  # the query's own vector is always found


def test_ivf_pq_batch_search_recall(spark, sf_dir, tmp_path):
    """Batch ADC probe: per-query LUTs as expressions, codes-only scan.
    Per-query candidates must overlap the exact top-k strongly, and each
    query must find its own vector first."""
    from vector_search_databricks_poc_spark.operators.index import build_ivf_pq_index

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = build_ivf_pq_index(
        e, str(tmp_path / "ivfpq_b"), k_centroids=8, pq_m=16, pq_k=16
    )
    queries = e.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = idx.batch_search(spark, queries, k=40, nprobe=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    assert set(by_q) == {0, 1, 2, 3}
    norm = e.select("vec_id", V.l2_normalize("embedding").alias("embedding"))
    for qid, ranked in by_q.items():
        ids = [v for _, v in sorted(ranked)]
        assert ids[0] == qid  # own vector tops its query (residual ~0)
        qv = list(e.where(F.col("vec_id") == qid).first()["embedding"])
        exact = {r["vec_id"] for r in top_k_similar(norm, qv, k=10).collect()}
        assert len(exact & set(ids)) >= 7, (qid, exact, ids)
