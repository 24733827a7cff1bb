"""Index rebalance: the lifecycle end the delta-sync contract leaves open.

Incremental sync assigns new rows to the EXISTING centroids (reference
syntetic_data.py:69-78 — the service never refits the ANN structure on
sync), so a drifting corpus piles rows onto a few centroids.
index_balance_report / index_imbalance expose that; rebalance_ivf_index
refits and rewrites when it crosses a threshold.  Exactness contract:
IVF-Flat with a full probe is brute force, so a rebalance must never
change full-probe search results."""

import pytest
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.operators.incremental import (
    incremental_refresh,
    index_balance_report,
    index_imbalance,
    rebalance_ivf_index,
)
from vector_search_databricks_poc_spark.operators.index import (
    build_ivf_index,
    build_ivf_pq_index,
    load_index,
)


def _two_cluster_corpus(spark, n_a=24, n_b=140, dim=8):
    """Deterministic two-cluster corpus: cluster A (ids 0..n_a-1) near e0,
    cluster B (ids n_a..) near e1 — B ids are HIGHER so the high-watermark
    append picks up exactly cluster B."""
    rows = []
    for i in range(n_a):
        v = [0.0] * dim
        v[0] = 1.0
        v[1 + (i % 3)] = 0.05 + 0.01 * (i % 5)
        rows.append((i, v))
    for i in range(n_b):
        v = [0.0] * dim
        v[1] = 1.0
        v[2 + (i % 3)] = 0.05 + 0.01 * (i % 7)
        rows.append((n_a + i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _skewed_index(spark, tmp_path, k=4):
    """Fit on cluster A only, then append cluster B with the frozen
    centroids — every B row lands on A-region centroids => heavy skew."""
    corpus = _two_cluster_corpus(spark)
    a_only = corpus.where(F.col("vec_id") < 24)
    idx = build_ivf_index(a_only, str(tmp_path / "ivf"), k_centroids=k)
    n_new = incremental_refresh(spark, idx, corpus)
    assert n_new == 140
    return idx, corpus


def test_balance_report_shows_incremental_skew(spark, tmp_path):
    idx, corpus = _skewed_index(spark, tmp_path)
    rep = index_balance_report(spark, idx).collect()
    assert len(rep) == 4  # one row per centroid, empties included
    assert sum(r["n_rows"] for r in rep) == corpus.count()
    assert abs(sum(r["frac_rows"] for r in rep) - 1.0) < 1e-4
    # the 140 drifted rows all sit on centroids fit from cluster A
    assert max(r["n_rows"] for r in rep) >= 140
    assert index_imbalance(spark, idx) > 2.0


def test_rebalance_restores_balance_and_preserves_search(spark, tmp_path):
    idx, corpus = _skewed_index(spark, tmp_path)
    imb_before = index_imbalance(spark, idx)

    q = [0.0] * 8
    q[1] = 1.0  # a cluster-B query
    before = sorted(
        (r["vec_id"], r["score"])
        for r in idx.search(spark, q, k=8, nprobe=4).collect()
    )

    new_idx, did = rebalance_ivf_index(spark, idx, threshold=2.0)
    assert did
    assert index_imbalance(spark, new_idx) < imb_before
    assert spark.read.parquet(new_idx.path).count() == corpus.count()

    # full probe == brute force: rebalance must not change results
    after = sorted(
        (r["vec_id"], r["score"])
        for r in new_idx.search(spark, q, k=8, nprobe=4).collect()
    )
    assert after == before

    # the persisted _meta carries the NEW centroids: a fresh handle from
    # disk probes the rebalanced layout, not the stale quantizer
    reloaded = load_index(spark, new_idx.path)
    assert reloaded.centroids == new_idx.centroids
    assert reloaded.centroids != idx.centroids


def test_rebalance_below_threshold_is_noop(spark, tmp_path):
    corpus = _two_cluster_corpus(spark)
    idx = build_ivf_index(corpus, str(tmp_path / "ivf"), k_centroids=4)
    imb = index_imbalance(spark, idx)
    same, did = rebalance_ivf_index(spark, idx, threshold=imb + 1.0)
    assert not did
    assert same is idx  # untouched handle, no rewrite


def test_rebalance_refuses_pq_index(spark, tmp_path):
    corpus = _two_cluster_corpus(spark)
    pq = build_ivf_pq_index(
        corpus, str(tmp_path / "ivfpq"), k_centroids=4, pq_m=4, pq_k=16
    )
    with pytest.raises(ValueError, match="codebook"):
        rebalance_ivf_index(spark, pq, threshold=0.0)


def test_compact_index_rewrites_only_fragmented_partitions(spark, tmp_path):
    """Repeated incremental appends fragment the touched partitions;
    compact_index must merge exactly those above the file threshold,
    preserve every row and the partition layout, and leave untouched
    partitions' files alone."""
    import os

    from vector_search_databricks_poc_spark.operators.incremental import (
        compact_index,
        index_file_counts,
    )

    corpus = _two_cluster_corpus(spark)
    a_only = corpus.where(F.col("vec_id") < 24)
    idx = build_ivf_index(a_only, str(tmp_path / "ivf"), k_centroids=4)
    # six appends, 1-file batches each -> the B-heavy partitions fragment
    for lo in range(24, 164, 24):
        batch = corpus.where(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 24)
        ).coalesce(1)
        incremental_refresh(spark, idx, batch)

    before = index_file_counts(spark, idx)
    assert max(before.values()) > 3
    frozen = [cid for cid, n in before.items() if n <= 3]
    frozen_files = {
        cid: sorted(os.listdir(f"{idx.path}/centroid_id={cid}"))
        for cid in frozen
    }
    rows_before = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in spark.read.parquet(idx.path).select("vec_id", "centroid_id").collect()
    )

    done = compact_index(spark, idx, max_files_per_partition=3)
    assert done and set(done) == {c for c, n in before.items() if n > 3}

    after = index_file_counts(spark, idx)
    assert set(after) == set(before)  # partition layout preserved
    for cid in done:
        assert after[cid] < before[cid]
        assert after[cid] == done[cid]
    for cid in frozen:  # untouched partitions keep their exact files
        assert sorted(os.listdir(f"{idx.path}/centroid_id={cid}")) == frozen_files[cid]

    rows_after = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in spark.read.parquet(idx.path).select("vec_id", "centroid_id").collect()
    )
    assert rows_after == rows_before

    # the handle still probes correctly after the rewrite
    q = [0.0] * 8
    q[1] = 1.0
    hits = idx.search(spark, q, k=5, nprobe=4).collect()
    assert len(hits) == 5


def test_rebalance_preserves_payload_columns(spark, tmp_path):
    corpus = _two_cluster_corpus(spark).withColumn(
        "title", F.concat(F.lit("doc-"), F.col("vec_id"))
    )
    a_only = corpus.where(F.col("vec_id") < 24)
    idx = build_ivf_index(
        a_only, str(tmp_path / "ivf"), k_centroids=4, extra_cols=("title",)
    )
    incremental_refresh(spark, idx, corpus)
    new_idx, did = rebalance_ivf_index(spark, idx, threshold=2.0)
    assert did
    out = spark.read.parquet(new_idx.path)
    assert "title" in out.columns
    assert out.where(F.col("title") == F.concat(F.lit("doc-"), F.col("vec_id"))).count() == corpus.count()


def test_compaction_scratch_dirs_invisible_to_table_readers(spark, tmp_path):
    """An interrupted compaction swap leaves underscore-prefixed scratch
    dirs beside the partition; table reads and the file-count walk must
    skip them instead of inferring phantom partition values (the old
    `centroid_id=5__compact` naming crashed int() parsing and
    double-counted rows)."""
    from vector_search_databricks_poc_spark.operators.incremental import (
        index_file_counts,
    )
    from vector_search_databricks_poc_spark.operators.index import (
        build_ivf_index,
    )
    from tests.conftest import SF_DIR
    from vector_search_databricks_poc_spark.catalog import load_table

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    idx = build_ivf_index(e, str(tmp_path / "ivf"), k_centroids=4)
    n = spark.read.parquet(idx.path).count()

    # simulate a crash mid-swap: a stale staged copy AND a stale old copy
    # (dot-prefixed: underscore-prefixed dirs containing '=' are NOT
    # hidden from Spark's partition discovery)
    part = f"{idx.path}/centroid_id=0"
    for scratch in (
        f"{idx.path}/.compact_stage__centroid_id=0",
        f"{idx.path}/.compact_old__centroid_id=0",
    ):
        spark.read.parquet(part).write.mode("overwrite").parquet(scratch)

    again = spark.read.parquet(idx.path)
    assert again.count() == n  # no double count
    assert dict(again.dtypes)["centroid_id"] == "int"  # no string inference
    counts = index_file_counts(spark, idx)
    assert set(counts) == {0, 1, 2, 3}  # no phantom partitions, no crash
