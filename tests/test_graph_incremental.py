"""Graph-index incremental insert: invariants after insert, search
quality vs a from-scratch build, watermark no-op, entry-point refresh,
untouched-partition stability, and meta persistence.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.graph_ann import (
    build_graph_index,
    insert_into_graph,
    load_graph_index,
)
from vector_search_databricks_poc_spark.operators.topk import top_k_similar


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def split(spark, emb):
    n = emb.count()
    cut = n // 2
    return cut, emb.where(F.col("vec_id") < cut), emb.where(F.col("vec_id") >= cut)


@pytest.fixture(scope="module")
def inserted(spark, split, tmp_path_factory):
    """Build on the first half, insert the second half."""
    cut, first, second = split
    path = str(tmp_path_factory.mktemp("gins") / "graph")
    idx = build_graph_index(first, path, deg=8, k_centroids=8, refine_rounds=1)
    n = insert_into_graph(spark, idx, second)
    return idx, n


def _adjacency_invariants(spark, idx, expected_n):
    rows = spark.read.parquet(idx.path)
    assert rows.count() == expected_n
    assert rows.where(F.size("neighbors") > idx.deg).count() == 0
    edges = rows.select(
        F.col("vec_id").alias("src"), F.explode("neighbors").alias("nb")
    ).select(
        "src", F.col("nb.nbr_id").alias("dst"), F.col("nb.nbr_centroid").alias("cent")
    )
    assert edges.where(F.col("src") == F.col("dst")).count() == 0
    truth = rows.select(
        F.col("vec_id").alias("dst"), F.col("centroid_id").alias("true_cent")
    )
    assert edges.join(truth, "dst").where(F.col("cent") != F.col("true_cent")).count() == 0
    assert edges.join(truth, "dst", "left_anti").count() == 0  # no dangling ids


def test_insert_count_and_invariants(spark, emb, split, inserted):
    cut, first, second = split
    idx, n = inserted
    assert n == second.where(F.col("embedding").isNotNull()).count()
    _adjacency_invariants(
        spark, idx, emb.where(F.col("embedding").isNotNull()).count()
    )


def test_inserted_nodes_are_connected_both_ways(spark, inserted, split):
    """Every inserted node has outgoing edges, and symmetrization gave at
    least some pre-existing nodes edges INTO the new batch — otherwise new
    nodes are unreachable from old entry points."""
    cut, _, _ = split
    idx, _ = inserted
    rows = spark.read.parquet(idx.path)
    new_rows = rows.where(F.col("vec_id") >= cut)
    assert new_rows.where(F.size("neighbors") == 0).count() == 0
    old_to_new = (
        rows.where(F.col("vec_id") < cut)
        .select(F.explode("neighbors").alias("nb"))
        .where(F.col("nb.nbr_id") >= cut)
        .count()
    )
    assert old_to_new > 0


def test_search_after_insert_reaches_new_and_old(spark, emb, inserted, split):
    """Recall vs exact brute force over the FULL corpus, for queries that
    are old nodes, new nodes, and the exact vector of a new node (which
    must come back rank-1 — entry/meta refresh made it reachable)."""
    cut, _, _ = split
    idx, _ = inserted
    n_emb = emb.count()
    for vid in (0, cut + 1, n_emb - 1):
        q = emb.where(F.col("vec_id") == vid).first()["embedding"]
        exact = {r["vec_id"] for r in top_k_similar(emb, q, k=10).collect()}
        got = idx.search(spark, q, k=10, ef=48, nprobe=4).collect()
        hits = {r["vec_id"] for r in got}
        assert len(hits & exact) >= 8, f"query {vid}: {len(hits & exact)}/10"
        assert got[0]["vec_id"] == vid  # self-hit always reachable


def test_insert_below_watermark_is_noop(spark, inserted, split, emb):
    cut, first, _ = split
    idx, _ = inserted
    before = sorted(
        tuple(r)
        for r in spark.read.parquet(idx.path).select("vec_id", "neighbors").collect()
    )
    assert insert_into_graph(spark, idx, first) == 0
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(idx.path).select("vec_id", "neighbors").collect()
    )
    assert before == after


def test_meta_survives_insert(spark, inserted):
    """A fresh handle loaded from disk sees the post-insert entry points
    and searches identically."""
    idx, _ = inserted
    reloaded = load_graph_index(spark, idx.path)
    assert reloaded.entries == idx.entries
    assert reloaded.deg == idx.deg


def test_untouched_partitions_keep_their_files(spark, emb, tmp_path):
    """An insert whose batch lands in a strict subset of partitions must
    not rewrite the others (dynamic partition overwrite contract)."""
    corpus = emb.limit(300)
    path = str(tmp_path / "gpart")
    idx = build_graph_index(corpus, path, deg=4, k_centroids=8, refine_rounds=0)
    files_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{path}/centroid_id=*/*.parquet")
    }
    # a tiny batch: its edges (and their symmetric reverses) concentrate
    # near the batch's own centroid regions, so some partitions stay cold
    n = insert_into_graph(
        spark, idx, emb.where(F.col("vec_id").between(300, 301))
    )
    assert n == 2
    untouched_same = sum(
        1
        for p, mt in files_before.items()
        if os.path.exists(p) and os.path.getmtime(p) == mt
    )
    assert untouched_same > 0, "every partition was rewritten"
    _adjacency_invariants(spark, idx, 302)


def test_insert_skips_null_and_missized_vectors(spark, emb, tmp_path):
    corpus = emb.limit(100)
    dim = len(corpus.first()["embedding"])
    idx = build_graph_index(
        corpus, str(tmp_path / "gbad"), deg=4, k_centroids=2, refine_rounds=0
    )
    bad = spark.createDataFrame(
        [(1000, None), (1001, [1.0, 2.0]), (1002, [float(i) for i in range(dim)])],
        f"vec_id long, embedding array<float>",
    )
    assert insert_into_graph(spark, idx, bad) == 1
    rows = spark.read.parquet(idx.path)
    assert rows.where(F.col("vec_id").isin(1000, 1001)).count() == 0
    assert rows.where(F.col("vec_id") == 1002).count() == 1
