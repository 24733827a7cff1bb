"""Graph-ANN: build invariants, search recall, score exactness, persistence.

The graph search is approximate by design, so correctness is asserted as
(a) structural invariants of the built adjacency table, (b) recall against
the exact brute-force top-k, (c) EXACT score agreement for every id the
search does return (the approximation is in which ids are reached, never
in their scores), and (d) handle persistence (reload ≡ build handle).
"""

import pytest
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.graph_ann import (
    GraphIndex,
    build_graph_index,
    load_graph_index,
)
from vector_search_databricks_poc_spark.operators.topk import top_k_similar
from vector_search_databricks_poc_spark import vectors as V


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def gidx(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gann") / "graph")
    return build_graph_index(
        emb, path, deg=8, k_centroids=8, assign_n=2, refine_rounds=1
    )


def _qv(emb, vid):
    return emb.where(F.col("vec_id") == vid).first()["embedding"]


def test_adjacency_invariants(spark, gidx, emb):
    rows = spark.read.parquet(gidx.path)
    n = emb.where(F.col("embedding").isNotNull()).count()
    assert rows.count() == n  # every (non-null) vector is a node
    bad_deg = rows.where(F.size("neighbors") > gidx.deg).count()
    assert bad_deg == 0
    # no self-edges; neighbor structs point at the neighbor's REAL partition
    edges = rows.select(
        F.col("vec_id").alias("src"), F.explode("neighbors").alias("nb")
    ).select("src", F.col("nb.nbr_id").alias("dst"), F.col("nb.nbr_centroid").alias("cent"))
    assert edges.where(F.col("src") == F.col("dst")).count() == 0
    truth = rows.select(
        F.col("vec_id").alias("dst"), F.col("centroid_id").alias("true_cent")
    )
    mismatched = edges.join(truth, "dst").where(F.col("cent") != F.col("true_cent"))
    assert mismatched.count() == 0
    # dangling neighbor ids would break the hop join silently
    dangling = edges.join(truth, "dst", "left_anti")
    assert dangling.count() == 0


def test_search_recall_and_exact_scores(spark, gidx, emb):
    n = emb.count()
    for vid in (0, 7, 101):
        q = _qv(emb, vid)
        exact = {r["vec_id"] for r in top_k_similar(emb, q, k=10).collect()}
        got = gidx.search(spark, q, k=10, ef=48, nprobe=4).collect()
        assert len(got) == 10
        hits = {r["vec_id"] for r in got}
        assert len(hits & exact) >= 8, f"query {vid}: recall {len(hits & exact)}/10"
        # scores are EXACT for whatever ids the beam reached (k = corpus
        # size, NOT a huge constant — TakeOrderedAndProject sizes its
        # priority queue by k)
        truth = {
            r["vec_id"]: r["score"]
            for r in top_k_similar(emb, q, k=n).collect()
        }
        for r in got:
            assert r["score"] == pytest.approx(truth[r["vec_id"]], abs=2e-6)


def test_wide_beam_from_all_entries_is_near_exhaustive(spark, gidx, emb):
    """ef = corpus size + entry points in every partition: the beam should
    flood the (symmetrized, NN-Descent-repaired) graph and recover the
    exact top-10 on this corpus."""
    n = emb.count()
    q = _qv(emb, 3)
    exact = {r["vec_id"] for r in top_k_similar(emb, q, k=10).collect()}
    got = {
        r["vec_id"]
        for r in gidx.search(
            spark, q, k=10, ef=n, nprobe=len(gidx.centroids), max_hops=32
        ).collect()
    }
    assert got == exact


def test_batch_search_matches_per_query_search(spark, gidx, emb):
    """batch_search IS the engine (search delegates to it with one query);
    a multi-query batch must reproduce each query's solo result exactly —
    beams share hop jobs but never state."""
    vids = [0, 7, 101]
    qdf = spark.createDataFrame(
        [(v, [float(x) for x in _qv(emb, v)]) for v in vids],
        "query_id long, query_vec array<double>",
    )
    batch = gidx.batch_search(spark, qdf, k=10, ef=48, nprobe=4).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["score"]))
    assert set(by_q) == set(vids)
    for v in vids:
        solo = gidx.search(spark, _qv(emb, v), k=10, ef=48, nprobe=4).collect()
        got = [(i, s) for _, i, s in sorted(by_q[v])]
        assert got == [(r["vec_id"], r["score"]) for r in solo], f"query {v}"


def test_batch_search_include_centroid_reports_true_partitions(spark, gidx, emb):
    """include_centroid=True appends each hit's REAL partition (free
    driver metadata — insert_into_graph relies on it to avoid a
    corpus-wide id→partition lookup); the values must match the table
    and the default schema must stay unchanged."""
    import pyspark.sql.functions as F

    qdf = spark.createDataFrame(
        [(v, [float(x) for x in _qv(emb, v)]) for v in (3, 42)],
        "query_id long, query_vec array<double>",
    )
    plain = gidx.batch_search(spark, qdf, k=5, ef=32, nprobe=4)
    assert plain.columns == ["query_id", "vec_id", "score", "rank"]
    withc = gidx.batch_search(
        spark, qdf, k=5, ef=32, nprobe=4, include_centroid=True
    )
    assert withc.columns == ["query_id", "vec_id", "score", "centroid_id", "rank"]
    truth = {
        int(r["vec_id"]): int(r["centroid_id"])
        for r in spark.read.parquet(gidx.path)
        .select("vec_id", "centroid_id")
        .collect()
    }
    rows = withc.collect()
    assert rows, "expected hits"
    for r in rows:
        assert truth[int(r["vec_id"])] == int(r["centroid_id"])
    # hit sets identical with and without the extra column
    a = {(r["query_id"], r["vec_id"], r["rank"]) for r in plain.collect()}
    b = {(r["query_id"], r["vec_id"], r["rank"]) for r in rows}
    assert a == b


def test_reloaded_handle_gives_identical_results(spark, gidx, emb):
    reloaded = load_graph_index(spark, gidx.path)
    assert isinstance(reloaded, GraphIndex)
    assert reloaded.entries == gidx.entries
    assert reloaded.deg == gidx.deg
    q = _qv(emb, 42)
    a = [tuple(r) for r in gidx.search(spark, q, k=5, ef=32, nprobe=2).collect()]
    b = [tuple(r) for r in reloaded.search(spark, q, k=5, ef=32, nprobe=2).collect()]
    assert a == b


def test_build_is_deterministic(spark, emb, tmp_path):
    a = build_graph_index(
        emb.limit(200), str(tmp_path / "g1"), deg=4, k_centroids=4, refine_rounds=0
    )
    b = build_graph_index(
        emb.limit(200), str(tmp_path / "g2"), deg=4, k_centroids=4, refine_rounds=0
    )
    ra = spark.read.parquet(a.path).select("vec_id", "neighbors").orderBy("vec_id")
    rb = spark.read.parquet(b.path).select("vec_id", "neighbors").orderBy("vec_id")
    assert [tuple(r) for r in ra.collect()] == [tuple(r) for r in rb.collect()]
    assert a.entries == b.entries


def test_null_vectors_dropped_and_tiny_corpus(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, None), (4, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    idx = build_graph_index(
        df, str(tmp_path / "tiny"), deg=8, k_centroids=2, assign_n=1, refine_rounds=1
    )
    rows = spark.read.parquet(idx.path)
    assert rows.count() == 3  # the null row never becomes a node
    got = idx.search(spark, [1.0, 0.0], k=3, ef=8, nprobe=2).collect()
    assert [r["vec_id"] for r in got][0] == 1
    assert len(got) == 3


def test_build_rejects_bad_params(spark, emb, tmp_path):
    with pytest.raises(ValueError, match="deg"):
        build_graph_index(emb, str(tmp_path / "x"), deg=0)
    with pytest.raises(ValueError, match="assign_n"):
        build_graph_index(emb, str(tmp_path / "y"), k_centroids=4, assign_n=5)


def test_load_graph_index_refuses_other_kinds(spark, emb, tmp_path):
    from vector_search_databricks_poc_spark.operators.index import build_ivf_index

    build_ivf_index(emb.limit(100), str(tmp_path / "ivf"), k_centroids=2)
    with pytest.raises(ValueError, match="graph"):
        load_graph_index(spark, str(tmp_path / "ivf"))


def test_hard_negative_mining_works_with_graph_index(spark, gidx, emb):
    """evaluate.hard_negative_mining is index-kind-agnostic: the graph's
    batch_search satisfies the same (spark, queries, k, nprobe) contract
    as the IVF family, so mined negatives exclude positives and rank by
    score with the graph as the candidate generator too."""
    from vector_search_databricks_poc_spark.operators.evaluate import (
        hard_negative_mining,
    )

    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
    )
    positives = queries.select("query_id", F.col("query_id").alias("vec_id"))
    neg = hard_negative_mining(
        spark, gidx, queries, positives, k_neg=3, fetch_mult=3, nprobe=4
    ).collect()
    by_q = {}
    for r in neg:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for qid, rows in by_q.items():
        assert len(rows) == 3
        assert all(r["vec_id"] != qid for r in rows)  # positives excluded
        scores = [r["score"] for r in sorted(rows, key=lambda r: r["neg_rank"])]
        assert scores == sorted(scores, reverse=True)


def test_batch_search_sharded_equals_unsharded(spark, gidx, emb):
    """shard_size loops independent query slices with bounded driver
    state (VERDICT r7 #2); per-query results must be IDENTICAL to the
    one-shard run — same ids, same scores, same ranks."""
    vids = [0, 3, 7, 42, 101, 150]
    qdf = spark.createDataFrame(
        [(v, [float(x) for x in _qv(emb, v)]) for v in vids],
        "query_id long, query_vec array<double>",
    )
    whole = gidx.batch_search(spark, qdf, k=10, ef=48, nprobe=4).collect()
    sharded = gidx.batch_search(
        spark, qdf, k=10, ef=48, nprobe=4, shard_size=2
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, sharded)) == sorted(map(tuple, whole))
    assert len({key(r) for r in sharded}) == len(sharded)
    # a shard larger than the batch is the unsharded path
    big = gidx.batch_search(
        spark, qdf, k=10, ef=48, nprobe=4, shard_size=1_000
    ).collect()
    assert sorted(map(tuple, big)) == sorted(map(tuple, whole))
    with pytest.raises(ValueError, match="shard_size"):
        gidx.batch_search(spark, qdf, k=10, shard_size=0)
