"""Empty-input robustness: operators must return empty results, not throw."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, LongType, StringType, StructField, StructType,
)

from vector_search_databricks_poc_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_near_dup_pairs,
)
from vector_search_databricks_poc_spark.operators.similarity_join import (
    brute_force_topk_join,
)
from vector_search_databricks_poc_spark.operators.topk import top_k_similar

EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)
DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], EMB_SCHEMA)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


def test_topk_on_empty_corpus(empty_emb):
    assert top_k_similar(empty_emb, [1.0, 2.0], k=5).count() == 0


def test_batch_join_empty_queries(spark, sf_dir, empty_emb):
    from vector_search_databricks_poc_spark.catalog import load_table

    corpus = load_table(spark, sf_dir, "embeddings")
    queries = empty_emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assert brute_force_topk_join(queries, corpus, k=3).count() == 0


def test_dedup_on_empty(empty_docs):
    assert exact_dedup(empty_docs, ["text"], "doc_id").count() == 0
    assert minhash_near_dup_pairs(empty_docs).count() == 0


def test_near_dup_on_empty(empty_emb):
    assert embedding_near_dup_pairs(empty_emb).count() == 0


def test_near_dup_single_row(spark):
    one = spark.createDataFrame([(1, [1.0, 0.0])], EMB_SCHEMA)
    assert embedding_near_dup_pairs(one, threshold=0.0).count() == 0


def test_upsert_with_empty_change_set(spark, sf_dir, tmp_path):
    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.operators.incremental import incremental_upsert
    from vector_search_databricks_poc_spark.operators.index import build_ivf_index

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = build_ivf_index(e, str(tmp_path / "idx"), k_centroids=4)
    before = spark.read.parquet(idx.path).count()
    n = incremental_upsert(spark, idx, e.where(F.col("vec_id") < 0))
    assert n == 0
    assert spark.read.parquet(idx.path).count() == before  # untouched


def test_prepare_training_data_on_empty(spark, empty_docs):
    from vector_search_databricks_poc_spark.pipelines import prepare_training_data

    docs = empty_docs.withColumn("lang", F.lit("en"))
    train, test = prepare_training_data(docs)
    assert train.count() == 0 and test.count() == 0


def test_chunk_and_strip_html_null_safety(spark):
    from pyspark.sql import Row

    from vector_search_databricks_poc_spark.operators.text import chunk_documents, strip_html

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert df.select(strip_html("text").alias("t")).first()["t"] is None
    # null text -> tokens() null -> one empty chunk row, not a crash
    assert chunk_documents(df).count() <= 1


def test_pack_sequences_empty(empty_docs):
    from vector_search_databricks_poc_spark.operators.packing import pack_sequences

    d = empty_docs.select("doc_id", F.lit(0).cast("long").alias("n_tokens"))
    out = pack_sequences(d, budget=128, n_groups=4)
    assert out.count() == 0
    assert {"pack_group", "pack_id", "pack_pos"} <= set(out.columns)


def test_domain_mixture_empty_and_unmatched(spark, empty_docs):
    from vector_search_databricks_poc_spark.operators.packing import (
        domain_mixture_sample,
    )

    d = empty_docs.withColumn("source", F.lit("x"))
    assert domain_mixture_sample(d, "source", {"a": 1.0}).count() == 0
    # non-empty frame, but no domain matches the weights -> empty, not error
    one = spark.createDataFrame([(1, "t", "zzz")], "doc_id long, text string, source string")
    assert domain_mixture_sample(one, "source", {"a": 1.0}).count() == 0


def test_cluster_dedup_fewer_rows_than_k(spark):
    from vector_search_databricks_poc_spark.operators.packing import cluster_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = cluster_dedup(df, k=8).collect()
    assert len(out) == 2 and all(r.is_keeper for r in out)


def test_z_value_constant_column(spark):
    """A constant column must not divide by zero; its bits contribute 0."""
    from vector_search_databricks_poc_spark.operators.layout import z_value

    df = spark.createDataFrame([(7, 1), (7, 2), (7, 3)], "a long, b long")
    zs = [r._z for r in z_value(df, ["a", "b"], bits=4).collect()]
    assert len(zs) == 3 and len(set(zs)) == 3  # b still discriminates


def test_skew_stats_empty(spark):
    from vector_search_databricks_poc_spark.operators.layout import skew_stats

    e = spark.createDataFrame([], "k long")
    assert skew_stats(e, ["k"]).count() == 0


def test_interval_join_empty_sides(spark, sf_dir):
    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    empty = ev.limit(0)
    assert interval_join(empty, ev, key="user_id").count() == 0
    assert interval_join(ev, empty, key="user_id").count() == 0


def test_event_analytics_empty(spark):
    """Funnel / cohort / contract / join-sizing ops degrade gracefully on
    empty inputs: empty or zero-count reports, never errors."""
    from vector_search_databricks_poc_spark.operators.funnel import (
        cohort_retention,
        funnel_conversions,
        funnel_user_times,
    )
    from vector_search_databricks_poc_spark.operators.joins import join_size_stats
    from vector_search_databricks_poc_spark.operators.quality import (
        not_null,
        validate_table,
    )

    ev = spark.createDataFrame([], "user_id long, event_type string, ts timestamp")
    assert funnel_user_times(ev, ["view", "click"]).count() == 0
    conv = funnel_conversions(ev, ["view", "click"]).collect()
    assert [r.n_users for r in conv] == [0, 0]
    assert all(r.conversion is None for r in conv)
    assert cohort_retention(ev).count() == 0

    t = spark.createDataFrame([], "id long, v double")
    rep = validate_table(t, row_rules=[not_null("id")]).collect()
    assert rep[0].violations == 0 and rep[0].total == 0 and rep[0].ok

    js = join_size_stats(t, t, "id").first()
    assert js.matching_keys == 0 and js.join_rows == 0
    assert js.max_key_pairs == 0 and js.top_key is None


def test_relative_heavy_hitters_empty_and_uniform(spark):
    """Empty input and all-unique keys both degrade to empty results —
    and a perfectly uniform distribution has NO key above 1.2x the mean."""
    from vector_search_databricks_poc_spark.operators.sketches import (
        relative_heavy_hitters,
    )

    empty = spark.createDataFrame([], "k string, v long")
    assert relative_heavy_hitters(empty, "k").count() == 0
    uniform = spark.createDataFrame(
        [(f"k{i % 50}",) for i in range(500)], ["k"]
    ).repartition(8)
    assert relative_heavy_hitters(uniform, "k", mean_mult=1.2).count() == 0


def test_token_budget_mixture_empty(spark, empty_docs):
    from vector_search_databricks_poc_spark.operators.packing import (
        token_budget_mixture_sample,
    )

    df = empty_docs.select(
        "doc_id", F.lit("web").alias("source"), F.lit(1).alias("n_tokens")
    )
    assert token_budget_mixture_sample(df, "source", {"web": 1.0}).count() == 0


def test_quality_keepers_empty_and_no_pairs(spark, empty_docs):
    from vector_search_databricks_poc_spark.operators.components import (
        quality_dedup_keepers,
    )

    pairs_schema = "id_a long, id_b long"
    no_pairs = spark.createDataFrame([], pairs_schema)
    scored_empty = empty_docs.select("doc_id", F.lit(1.0).alias("q"))
    assert quality_dedup_keepers(scored_empty, no_pairs, "doc_id", "q").count() == 0
    # non-empty corpus, zero duplicate pairs: everyone is their own keeper
    docs = spark.createDataFrame([(1, 2.0), (2, 1.0)], "doc_id long, q double")
    out = quality_dedup_keepers(docs, no_pairs, "doc_id", "q").collect()
    assert all(r["is_keeper"] and r["representative"] == r["doc_id"] for r in out)


def test_gate_batch_empty_batch(spark, empty_docs, tmp_path):
    """An empty micro-batch must not corrupt the gate's artifacts."""
    from vector_search_databricks_poc_spark.streaming.dedup_gate import _gate_batch

    acc = str(tmp_path / "acc")
    store = str(tmp_path / "store")
    docs = spark.createDataFrame([(1, "some real document text")],
                                 "doc_id long, text string")
    _gate_batch(docs, 0, acc, store, threshold=0.5)
    _gate_batch(empty_docs, 1, acc, store, threshold=0.5)
    assert spark.read.parquet(acc).count() == 1
    # and a later real batch still lands
    docs2 = spark.createDataFrame([(2, "a completely different article body")],
                                  "doc_id long, text string")
    _gate_batch(docs2, 2, acc, store, threshold=0.5)
    assert spark.read.parquet(acc).count() == 2


def test_bpe_decode_empty_and_null(spark):
    from vector_search_databricks_poc_spark.functions.bpe import (
        bpe_decode_ids_udf, bpe_vocab, train_bpe_merges,
    )

    counts = [("low", 5)]
    merges = train_bpe_merges(counts, num_merges=4)
    dec = bpe_decode_ids_udf(bpe_vocab(counts, merges))
    df = spark.createDataFrame([([],), (None,)], "ids array<int>")
    got = [r["t"] for r in df.select(dec(F.col("ids")).alias("t")).collect()]
    assert got == ["", None]


def test_manifest_ops_empty_and_edge_dirs(spark, tmp_path):
    """Manifest ops raise a clear ValueError on file-less directories, and
    a directory whose only parquet holds zero rows still round-trips:
    every file is prunable (0 rows), and pruned_read returns an empty
    frame with the right schema."""
    from vector_search_databricks_poc_spark.operators.layout import (
        file_stats_manifest,
        pruned_read,
        refresh_manifest,
        write_manifest,
    )

    empty_dir = tmp_path / "no_files"
    empty_dir.mkdir()
    for fn in (file_stats_manifest, write_manifest, refresh_manifest):
        with pytest.raises(ValueError, match="no parquet data files"):
            fn(spark, str(empty_dir))
    with pytest.raises(ValueError, match="no parquet data files"):
        pruned_read(spark, str(empty_dir), {"x": (0, 1)})

    zero_rows = str(tmp_path / "zero_rows")
    spark.createDataFrame([], "id long, v double").coalesce(1).write.parquet(zero_rows)
    assert write_manifest(spark, zero_rows) == 1
    out = pruned_read(spark, zero_rows, {"v": (0.0, 1.0)})
    assert out.count() == 0 and set(out.columns) == {"id", "v"}


def test_fuzzy_ops_empty_inputs(spark):
    from vector_search_databricks_poc_spark.operators.fuzzy import (
        fuzzy_dedup,
        fuzzy_join,
        fuzzy_key_store,
        fuzzy_self_pairs,
        incremental_fuzzy_match,
    )

    empty = spark.createDataFrame([], "kid long, key string")
    some = spark.createDataFrame([(1, "name")], ["cid", "cname"])
    assert fuzzy_self_pairs(empty, "key", "kid").count() == 0
    assert fuzzy_join(empty, some, "key", "cname", "kid", "cid").count() == 0
    assert fuzzy_dedup(empty, "key", "kid").count() == 0
    # empty store: batch still matches within itself
    store = fuzzy_key_store(empty, col="key", id_col="kid")
    out = incremental_fuzzy_match(
        spark.createDataFrame([(1, "ab"), (2, "ab")], ["kid", "key"]),
        store, col="key", id_col="kid",
    ).collect()
    assert [(r["id_a"], r["id_b"], r["origin"]) for r in out] == [(1, 2, "new_new")]


def test_pagerank_empty_edges(spark):
    from vector_search_databricks_poc_spark.operators.linkrank import (
        centrality_keepers,
        pagerank,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, iters=3).count() == 0
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert centrality_keepers(empty_pairs, iters=3).count() == 0


def test_binary_quant_empty_and_null_guard(spark):
    from vector_search_databricks_poc_spark.operators.binary_quant import (
        binary_search,
        mean_vector,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="at least one"):
        mean_vector(empty)
    # search over an empty corpus with a valid fitted mean: empty result
    out = binary_search(empty, [0.0, 0.0], [1.0, -1.0], k=5)
    assert out.count() == 0


def test_matview_refresh_empty_state_all_inserts(spark):
    """Bootstrapping: empty state + all-insert diff == full recompute."""
    from vector_search_databricks_poc_spark.operators.diff import snapshot_diff
    from vector_search_databricks_poc_spark.operators.matview import (
        group_agg,
        incremental_agg_refresh,
    )

    old = spark.createDataFrame([], "rid long, g string, v long")
    new = spark.createDataFrame([(1, "a", 5), (2, "a", 7)], ["rid", "g", "v"])
    measures = {"n": ("count", "rid"), "total": ("sum", "v")}
    state = group_agg(old, ["g"], measures)
    diff = snapshot_diff(old, new, id_col="rid")
    for mode in ("recount_groups", "delta"):
        got = incremental_agg_refresh(
            state, old, new, diff, keys=["g"], measures=measures,
            id_col="rid", mode=mode,
        ).collect()
        assert [(r["g"], r["n"], r["total"]) for r in got] == [("a", 2, 12)], mode


def test_embedding_drift_empty_new_snapshot(spark):
    """A fully-drained snapshot must produce finite PSI, not inf/NaN
    (the eps smoothing), with n_new = 0."""
    from vector_search_databricks_poc_spark.operators.drift import embedding_drift
    from vector_search_databricks_poc_spark.operators.pca import PcaModel

    model = PcaModel([[1.0, 0.0], [0.0, 1.0]], [0.0, 0.0], [1.0, 1.0])
    old = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 4.0],)], "embedding: array<double>"
    )
    new = spark.createDataFrame([], "embedding array<double>")
    rows = embedding_drift(old, new, model).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["n_new"] == 0
        assert r["psi"] == r["psi"] and abs(r["psi"]) < float("inf")


def test_maxsim_empty_corpus_and_all_null(spark):
    """An empty or all-null token-vector corpus returns an empty top-k
    (never a crash or a NULL-score row) on both the exact and the
    retrieve-then-rerank paths."""
    from vector_search_databricks_poc_spark.operators.multivec import (
        maxsim_topk,
        maxsim_topk_pruned,
        multi_vector_expr,
        py_multi_vector,
    )

    q = py_multi_vector("some query", dim=16)
    empty = spark.createDataFrame(
        [], "doc_id long, token_vecs array<array<double>>"
    )
    assert maxsim_topk(empty, q, k=5).count() == 0
    assert maxsim_topk_pruned(empty, q, k=5, m=8).count() == 0

    nulls = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    ).withColumn("token_vecs", multi_vector_expr("text", dim=16, portable=True))
    assert maxsim_topk(nulls, q, k=5).count() == 0
