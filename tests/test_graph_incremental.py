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
    res = insert_into_graph(spark, idx, first)
    assert res == 0
    # discarded updates are reported, never silent (r6 ADVICE)
    assert res.skipped == first.count()
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
    res = insert_into_graph(spark, idx, bad)
    assert res == 1
    assert res.skipped == 2  # null vec + wrong dim, reported not silent
    rows = spark.read.parquet(idx.path)
    assert rows.where(F.col("vec_id").isin(1000, 1001)).count() == 0
    assert rows.where(F.col("vec_id") == 1002).count() == 1


def test_stream_graph_sync_matches_batch_insert(spark, sf_dir, tmp_path):
    """Stream-landing documents into a graph index reaches EXACTLY the
    state of the batch build+insert path (one micro-batch — insertion
    order is part of the graph's state, so the equivalence is per-batch),
    and a streamed document is findable afterwards."""
    from vector_search_databricks_poc_spark.functions.embedding import embed_text
    from vector_search_databricks_poc_spark.streaming.index_sync import (
        stream_graph_sync,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first = docs.where(F.col("doc_id") < 250)
    rest = docs.where(F.col("doc_id") >= 250)
    emb = lambda d: embed_text(d, dim=32).select(  # noqa: E731
        F.col("doc_id").alias("vec_id"), "embedding"
    )

    # twin A: batch insert
    idx_a = build_graph_index(
        emb(first), str(tmp_path / "ga"), deg=8, k_centroids=4, refine_rounds=0
    )
    insert_into_graph(spark, idx_a, emb(rest))

    # twin B: identical initial graph, second half stream-landed
    idx_b = build_graph_index(
        emb(first), str(tmp_path / "gb"), deg=8, k_centroids=4, refine_rounds=0
    )
    stage = str(tmp_path / "incoming")
    rest.coalesce(1).write.parquet(stage)  # one file -> one micro-batch
    stream = spark.readStream.schema(rest.schema).parquet(stage)
    q = stream_graph_sync(
        stream, idx_b, id_col="doc_id", dim=32,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    rows = lambda p: sorted(  # noqa: E731
        (r["vec_id"], r["centroid_id"], tuple(r["neighbors"]))
        for r in spark.read.parquet(p).collect()
    )
    assert rows(idx_a.path) == rows(idx_b.path)
    assert idx_a.entries == idx_b.entries

    # a streamed doc is findable by its own embedding through twin B
    target = rest.where(F.col("doc_id") == 400).select("text")
    qvec = list(embed_text(target, dim=32).first()["embedding"])
    hits = idx_b.search(spark, qvec, k=3, ef=16, nprobe=2).collect()
    assert hits and hits[0]["vec_id"] == 400


def test_graph_sync_batch_is_replay_safe(spark, emb, tmp_path):
    """The marker dedupe: re-running a committed batch_id is a no-op; and
    even WITHOUT the marker, the insert watermark refuses re-entry."""
    from vector_search_databricks_poc_spark.streaming.index_sync import (
        _graph_sync_batch,
    )

    idx = build_graph_index(
        emb.limit(100), str(tmp_path / "gr"), deg=4, k_centroids=2,
        refine_rounds=0,
    )
    batch = emb.where(F.col("vec_id").between(100, 109))
    _graph_sync_batch(batch, 7, idx)
    after_first = sorted(
        tuple(r)
        for r in spark.read.parquet(idx.path).select("vec_id", "neighbors").collect()
    )
    _graph_sync_batch(batch, 7, idx)  # marker hit: no-op
    _graph_sync_batch(batch, 8, idx)  # new batch id, same ids: watermark no-op
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(idx.path).select("vec_id", "neighbors").collect()
    )
    assert after == after_first
    assert len(after) == 110


def test_stream_graph_sync_rejects_dim_mismatch(spark, emb, tmp_path):
    from vector_search_databricks_poc_spark.streaming.index_sync import (
        stream_graph_sync,
    )

    idx = build_graph_index(
        emb.limit(50), str(tmp_path / "gd"), deg=4, k_centroids=2,
        refine_rounds=0,
    )
    stage = tmp_path / "in"
    stage.mkdir()
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(stage))
    with pytest.raises(ValueError, match="dim"):
        stream_graph_sync(stream, idx, dim=7)


def test_insert_dedupes_batch_ids(spark, emb, tmp_path):
    """An id sent twice in one batch becomes ONE node."""
    idx = build_graph_index(
        emb.limit(100), str(tmp_path / "gdup"), deg=4, k_centroids=2,
        refine_rounds=0,
    )
    batch = emb.where(F.col("vec_id").between(100, 104))
    doubled = batch.unionByName(batch)
    assert insert_into_graph(spark, idx, doubled) == 5
    rows = spark.read.parquet(idx.path)
    assert rows.count() == 105
    assert rows.groupBy("vec_id").count().where(F.col("count") > 1).count() == 0


def test_load_index_dispatches_graph_kind(spark, emb, tmp_path):
    """operators.index.load_index returns a GraphIndex for a graph table
    (pre-r6 it silently came back as an IvfIndex)."""
    from vector_search_databricks_poc_spark.operators.graph_ann import GraphIndex
    from vector_search_databricks_poc_spark.operators.index import load_index

    built = build_graph_index(
        emb.limit(100), str(tmp_path / "gload"), deg=4, k_centroids=2,
        refine_rounds=0,
    )
    got = load_index(spark, built.path)
    assert isinstance(got, GraphIndex)
    assert got.entries == built.entries


def test_batch_search_drops_null_query_vectors(spark, emb, tmp_path):
    idx = build_graph_index(
        emb.limit(100), str(tmp_path / "gnull"), deg=4, k_centroids=2,
        refine_rounds=0,
    )
    q = spark.createDataFrame(
        [(0, [r for r in emb.where(F.col("vec_id") == 0).first()["embedding"]]),
         (1, None)],
        "query_id long, query_vec array<double>",
    )
    got = idx.batch_search(spark, q, k=3, ef=8, nprobe=2).collect()
    assert {r["query_id"] for r in got} == {0}


def test_pipeline_graph_backend_end_to_end(spark, sf_dir, tmp_path):
    """§3.1/§3.2 with kind='graph': build over cleaned+embedded docs,
    search by query text, context contains the self document."""
    from vector_search_databricks_poc_spark.operators.graph_ann import GraphIndex
    from vector_search_databricks_poc_spark.pipelines import (
        build_index_pipeline,
        search_pipeline,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    idx = build_index_pipeline(
        docs, str(tmp_path / "gidx"), kind="graph", k_centroids=4, dim=32
    )
    assert isinstance(idx, GraphIndex)
    target = docs.where(F.col("doc_id") == 11).first()["text"]
    out = search_pipeline(spark, idx, docs, target, k=3, nprobe=4, dim=32)
    row = out.first()
    assert "context" in out.columns
    assert "[11]" in row["context"]


def test_upsert_into_graph_replaces_vector(spark, emb, tmp_path):
    """An upsert of an EXISTING id re-embeds it: the stored vector
    changes, old edges are repaired away, and the node is findable by its
    NEW vector (delete-then-insert, the FreshDiskANN update contract)."""
    from vector_search_databricks_poc_spark.operators.graph_ann import (
        upsert_into_graph,
    )

    corpus = emb.limit(150)
    # deg=8 + a refine round: reverse edges into re-inserted nodes must
    # survive the prune (deg=4/refine=0 leaves outliers in-edge-less even
    # at BUILD time — a pruned-kNN-graph property, not an upsert one)
    idx = build_graph_index(
        corpus, str(tmp_path / "gup"), deg=8, k_centroids=3, refine_rounds=1
    )
    # new vector for id 10 = another live doc's embedding, so the new
    # position is realistic and well-connected
    donor = [float(x) for x in emb.where(F.col("vec_id") == 60).first()["embedding"]]
    batch = spark.createDataFrame(
        [(10, donor), (1000, donor)],  # one replace + one brand-new id
        "vec_id long, embedding array<float>",
    )
    stats = upsert_into_graph(spark, idx, batch)
    assert stats == {"upserted": 2, "replaced": 1, "skipped": 0}
    t = spark.read.parquet(idx.path)
    assert t.count() == 151
    got = [float(x) for x in t.where(F.col("vec_id") == 10).first()["embedding"]]
    import math

    n = math.sqrt(sum(x * x for x in donor))
    want = [x / n for x in donor]
    assert max(abs(a - b) for a, b in zip(got, want)) < 1e-6
    # all of {10, 60, 1000} sit at cos=1.0 to the query — the re-embedded
    # and the brand-new node must be findable at their new position
    hits = idx.search(spark, donor, k=3, ef=32, nprobe=3).collect()
    assert {10, 1000} & {int(h["vec_id"]) for h in hits}
    # rerun of the same batch: both ids now exist with these vectors —
    # delete+reinsert again, same final state (convergent)
    stats2 = upsert_into_graph(spark, idx, batch)
    assert stats2 == {"upserted": 2, "replaced": 2, "skipped": 0}
    assert spark.read.parquet(idx.path).count() == 151


def test_stream_graph_change_sync_reaches_batch_state(spark, emb, tmp_path):
    """Replaying a change log (inserts + an update + a delete) through
    stream_graph_change_sync reaches EXACTLY the state of applying the
    same collapsed per-batch ops directly."""
    from vector_search_databricks_poc_spark.operators.graph_ann import (
        delete_from_graph,
        upsert_into_graph,
    )
    from vector_search_databricks_poc_spark.streaming.index_sync import (
        stream_graph_change_sync,
    )

    base = emb.where(F.col("vec_id") < 100).select("vec_id", "embedding")
    donor = [float(x) for x in emb.where(F.col("vec_id") == 200).first()["embedding"]]
    # post-image: ids 0..99 minus deleted 7, id 5 re-embedded, new 100..109
    post = (
        base.where(~F.col("vec_id").isin(5, 7))
        .unionByName(
            spark.createDataFrame([(5, donor)], "vec_id long, embedding array<float>")
        )
        .unionByName(
            emb.where(F.col("vec_id").between(100, 109)).select("vec_id", "embedding")
        )
        .localCheckpoint()
    )
    log_rows = (
        [(i, "insert", 1, None) for i in range(100, 110)]
        + [(5, "update", 2, None), (7, "delete", 2, None)]
    )

    idx_a = build_graph_index(
        base, str(tmp_path / "ca"), deg=4, k_centroids=3, refine_rounds=0
    )
    idx_b = build_graph_index(
        base, str(tmp_path / "cb"), deg=4, k_centroids=3, refine_rounds=0
    )

    # twin B: the stream (one micro-batch: latest op per id, deletes first)
    log_path = str(tmp_path / "log")
    spark.createDataFrame(
        log_rows, "vec_id long, op string, batch_seq long, ts timestamp"
    ).coalesce(1).write.parquet(log_path)
    q = stream_graph_change_sync(
        idx_b, post, log_path, checkpoint_dir=str(tmp_path / "ck")
    )
    assert q.awaitTermination(180)

    # twin A: the same collapsed ops applied directly
    delete_from_graph(spark, idx_a, [7])
    upsert_batch = post.where(
        F.col("vec_id").isin([5] + list(range(100, 110)))
    )
    upsert_into_graph(spark, idx_a, upsert_batch)

    rows = lambda p: sorted(  # noqa: E731
        (r["vec_id"], r["centroid_id"], tuple(r["neighbors"]))
        for r in spark.read.parquet(p).collect()
    )
    assert rows(idx_a.path) == rows(idx_b.path)
    assert idx_a.entries == idx_b.entries
    alive = {r[0] for r in spark.read.parquet(idx_b.path).select("vec_id").collect()}
    assert 7 not in alive and {5, 100, 109} <= alive
