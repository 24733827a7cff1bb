"""Regression tests for the round-4 operator-review fixes: outer interval
joins, as-of null-key/collision semantics, session-gap boundary equivalence,
hybrid-search column collision, and the IVF-PQ search-pipeline composition."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _ts(s: str):
    import datetime as dt

    return dt.datetime.fromisoformat(s)


def test_interval_join_left_outer_keeps_unmatched(spark):
    """how='left' must KEEP left rows with no in-window right row (the
    range condition lives in the join condition; as a post-join filter it
    silently degraded 'left' to 'inner')."""
    from vector_search_databricks_poc_spark.streaming.joins import interval_join

    purchases = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts("2024-01-01 10:00:00"), amount=5.0),
            Row(user_id=2, ts=_ts("2024-01-01 10:00:00"), amount=7.0),  # no trigger
        ]
    )
    triggers = spark.createDataFrame(
        [Row(user_id=1, ts=_ts("2024-01-01 09:30:00"), event_type="ad")]
    )
    out = interval_join(
        purchases, triggers, key="user_id", upper="1 hour", how="left"
    )
    rows = {r["user_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["r_event_type"] == "ad"
    assert rows[2]["r_event_type"] is None and rows[2]["r_ts"] is None
    # inner still drops the unmatched row
    inner = interval_join(purchases, triggers, key="user_id", upper="1 hour")
    assert {r["user_id"] for r in inner.collect()} == {1}


def test_interval_join_out_of_window_right_not_matched_outer(spark):
    """A right row OUTSIDE the window must not match even under 'left' —
    the left row survives with null payload instead."""
    from vector_search_databricks_poc_spark.streaming.joins import interval_join

    l = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01 10:00:00"), a=1.0)])
    r = spark.createDataFrame(
        [Row(k=1, ts=_ts("2024-01-01 07:00:00"), b="stale")]  # 3h before
    )
    out = interval_join(l, r, key="k", upper="1 hour", how="left").collect()
    assert len(out) == 1 and out[0]["r_b"] is None


def test_attribution_report_custom_ts_names(spark):
    """attribution_report works with non-default timestamp column names
    (they arrive l_/r_-prefixed from interval_join's parameters)."""
    from vector_search_databricks_poc_spark.streaming.joins import (
        attribution_report,
        interval_join,
    )

    l = spark.createDataFrame(
        [Row(user_id=1, purchase_ts=_ts("2024-01-01 10:00:00"))]
    )
    r = spark.createDataFrame(
        [Row(user_id=1, signup_ts=_ts("2024-01-01 09:45:00"), event_type="promo")]
    )
    joined = interval_join(
        l, r, key="user_id", left_ts="purchase_ts", right_ts="signup_ts"
    )
    rep = attribution_report(
        joined, left_ts="l_purchase_ts", right_ts="r_signup_ts"
    ).collect()
    assert rep[0]["trigger_type"] == "promo"
    assert rep[0]["avg_latency_s"] == 900.0


def test_asof_join_null_keys_never_match(spark):
    """NULL-key rows must behave like SQL joins (no match), not share a
    'latest null-key right row' through the window partition."""
    from vector_search_databricks_poc_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            Row(k=1, lts=_ts("2024-01-01 10:00:00")),
            Row(k=None, lts=_ts("2024-01-01 10:00:00")),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts("2024-01-01 09:00:00"), px=1.5),
            Row(k=None, rts=_ts("2024-01-01 09:00:00"), px=9.9),
        ]
    )
    inner = asof_join(left, right, on="k", left_ts="lts", right_ts="rts").collect()
    assert len(inner) == 1 and inner[0]["k"] == 1 and inner[0]["px"] == 1.5
    outer = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", how="left"
    ).collect()
    got = {r["k"]: r["px"] for r in outer}
    assert got == {1: 1.5, None: None}


def test_asof_join_payload_collision_raises(spark):
    """A right payload column sharing a left column's name would emit an
    ambiguous duplicate — rejected loudly instead."""
    from vector_search_databricks_poc_spark.operators.asof import asof_join

    left = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01 10:00:00"), price=1.0)])
    right = spark.createDataFrame([Row(k=1, ts=_ts("2024-01-01 09:00:00"), price=2.0)])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts")


def test_session_gap_boundary_matches_native_session_window(spark, tmp_path):
    """Two events exactly `gap` apart: Spark's native session_window MERGES
    them (a new event whose window start touches the previous window's end
    extends the session — verified empirically here), so the batch
    lag/cumsum twin must use strict >, keeping boundary events together.
    This pins the boundary semantics of BOTH twins against each other."""
    from vector_search_databricks_poc_spark.streaming.windows import (
        session_windows_batch,
        session_windows_streaming,
    )

    ev = spark.createDataFrame(
        [
            Row(user_id=1, event_id=1, ts=_ts("2024-01-01 10:00:00")),
            Row(user_id=1, event_id=2, ts=_ts("2024-01-01 10:30:00")),  # == gap
            Row(user_id=1, event_id=3, ts=_ts("2024-01-01 11:20:00")),  # > gap
        ]
    )
    batch = session_windows_batch(ev, gap_minutes=30).collect()
    sizes = sorted(r["n_events"] for r in batch)
    assert sizes == [1, 2]  # boundary pair merged, the 50-min gap splits

    src = str(tmp_path / "sess")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        session_windows_streaming(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = spark.sql("SELECT n_events FROM sess_sink").collect()
    assert sorted(r["n_events"] for r in stream_rows) == sizes


def test_hybrid_search_query_df_named_embedding(spark, sf_dir):
    """The DataFrame-query branch must work when the query column is named
    'embedding' — the name embed_text naturally produces — despite the
    corpus vector column having the same name."""
    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.operators.hybrid import hybrid_search

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vectors = load_table(spark, sf_dir, "embeddings")
    qv = vectors.where(F.col("vec_id") == 0).select("embedding")  # collides
    out = hybrid_search(docs, vectors, ["vector", "search"], qv, k=5).collect()
    assert len(out) == 5
    # and the DataFrame branch is semantically identical to passing the
    # same vector as a Python literal
    qv_list = vectors.where(F.col("vec_id") == 0).first()["embedding"]
    lit = hybrid_search(docs, vectors, ["vector", "search"], list(qv_list), k=5).collect()
    assert [(r["doc_id"], r["rrf"]) for r in out] == [
        (r["doc_id"], r["rrf"]) for r in lit
    ]


def test_search_pipeline_composes_with_ivf_pq(spark, sf_dir, tmp_path):
    """§3.1 kind='ivf_pq' output must feed §3.2: the PQ index's ADC column
    is adapted to the pipeline's 'score' contract."""
    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.pipelines import (
        build_index_pipeline,
        search_pipeline,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    idx = build_index_pipeline(
        docs, str(tmp_path / "pq_idx"), kind="ivf_pq", k_centroids=4
    )
    out = search_pipeline(spark, idx, docs, "vector search embedding", k=3).collect()
    assert len(out) == 1
    assert out[0]["context"] and "[" in out[0]["context"]


def test_train_test_split_string_ids(spark):
    """String ids must hash through the portable fallback — previously
    cast('long') made every bucket NULL and BOTH split sides came back
    empty with no error."""
    from vector_search_databricks_poc_spark.operators.sampling import (
        train_test_split,
    )

    ids = [f"24{i:02d}.{i * 7:05d}v1" for i in range(200)]  # arXiv-style
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    train, test = train_test_split(df, "doc_id", test_fraction=0.2)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 200
    assert n_train > 0 and n_test > 0
    # deterministic: same membership on a rerun
    again, _ = train_test_split(df, "doc_id", test_fraction=0.2)
    assert train.exceptAll(again).count() == 0


def test_split_bucket_huge_ids_no_overflow(spark):
    """Ids above ~3.5e9 overflowed id * 2654435761 in int64 (ANSI crash);
    the pre-mod keeps the math in range and the buckets identical for
    small ids."""
    from vector_search_databricks_poc_spark.operators.sampling import (
        split_bucket,
    )

    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame(
            [(4_000_000_000,), (9_000_000_000_000,), (7,)], ["id"]
        )
        rows = df.select("id", split_bucket("id").alias("b")).collect()
        assert all(0 <= r["b"] < 100 for r in rows)
        # small-id bucket unchanged from the original formula
        assert {r["id"]: r["b"] for r in rows}[7] == (7 * 2654435761 % 2147483647) % 100
    finally:
        spark.conf.unset("spark.sql.ansi.enabled")


def test_domain_mixture_missing_weighted_domain_returns_empty(spark):
    """A weighted domain with zero corpus rows must clamp N to 0 (the
    mixture is infeasible) instead of silently returning a one-domain
    'mixture' against a 50/50 target."""
    from vector_search_databricks_poc_spark.operators.packing import (
        domain_mixture_sample,
    )

    df = spark.createDataFrame(
        [(i, "a") for i in range(100)], ["doc_id", "domain"]
    )
    out = domain_mixture_sample(df, "domain", {"a": 0.5, "b": 0.5})
    assert out.count() == 0
    # feasible mixtures still work
    df2 = df.union(
        spark.createDataFrame([(1000 + i, "b") for i in range(50)], ["doc_id", "domain"])
    )
    kept = domain_mixture_sample(df2, "domain", {"a": 0.5, "b": 0.5})
    by_dom = {r["domain"]: r["n"] for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert by_dom == {"a": 50, "b": 50}


def test_topk_ignores_nan_scores(spark):
    """One corrupt embedding (NaN) must not occupy rank 1 of every query —
    NaN sorts above every real value in descending order without the
    isnan guard."""
    from vector_search_databricks_poc_spark.operators.topk import top_k_similar

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [float("nan"), 1.0]),  # corrupt
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = top_k_similar(df, [1.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in out] == [1, 2]


def test_pq_encode_and_search_tolerate_null_vectors(spark, tmp_path):
    """A NULL embedding must not TypeError the PQ encode or the planning
    UDF: null corpus rows are dropped from the index, null query vectors
    from the query set."""
    from vector_search_databricks_poc_spark.operators.index import (
        build_ivf_pq_index,
    )

    import random

    random.seed(7)
    rows = [(i, [random.random() for _ in range(8)]) for i in range(64)]
    rows.append((999, None))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = build_ivf_pq_index(
        df, str(tmp_path / "pq"), k_centroids=2, pq_m=2, pq_k=4
    )
    stored = spark.read.parquet(idx.path)
    assert stored.count() == 64  # null row excluded
    queries = spark.createDataFrame(
        [(0, rows[0][1]), (1, None)], "query_id long, query_vec array<double>"
    )
    hits = idx.batch_search(spark, queries, k=3, nprobe=2).collect()
    qids = {r["query_id"] for r in hits}
    assert qids == {0}  # null query dropped, real one answered
    assert 999 not in {r["vec_id"] for r in hits}


def test_pack_sequences_group_capacity_guard(spark):
    from vector_search_databricks_poc_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, 10)], ["doc_id", "n_tokens"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_groups"):
        pack_sequences(df, n_groups=(1 << 20) + 1)


def test_compact_files_swap_preserves_data(spark, tmp_path):
    """The staged-swap protocol must end with the compacted data at the
    original path and no leftover __compact/__old directories."""
    import os

    from vector_search_databricks_poc_spark.operators.layout import compact_files

    path = str(tmp_path / "t")
    spark.range(10_000).repartition(24).write.parquet(path)
    n = compact_files(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    assert spark.read.parquet(path).count() == 10_000
    assert not os.path.exists(path + "__compact")
    assert not os.path.exists(path + "__old")


def test_exact_dedup_null_keys_pass_through(spark):
    """NULL-keyed rows must survive dedup untouched — the semi-join's
    NULL=NULL equality previously DELETED every null-text row."""
    from vector_search_databricks_poc_spark.operators.dedup import exact_dedup
    from vector_search_databricks_poc_spark.operators.text import canonical_dedup

    df = spark.createDataFrame(
        [(1, "Hello"), (2, "hello"), (3, None), (4, None), (5, "world")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"] for r in exact_dedup(df, ["text"], "doc_id").collect()}
    assert got == {1, 2, 3, 4, 5}  # exact: case differs, nulls pass through
    got = {r["doc_id"] for r in canonical_dedup(df).collect()}
    assert got == {1, 3, 4, 5}  # canonical: case folds, nulls pass through


def test_hashing_embedding_null_text_yields_null_vector(spark):
    """NULL text must embed to NULL (not an array of dim NULLs, which
    passes size()==dim validity checks and then NULLs every cosine)."""
    from vector_search_databricks_poc_spark import vectors as V
    from vector_search_databricks_poc_spark.functions.embedding import (
        hashing_embedding,
    )

    df = spark.createDataFrame([(1, "hello world"), (2, None)], ["id", "text"])
    out = df.select(
        "id",
        hashing_embedding("text", dim=4).alias("emb"),
    ).withColumn("ok", V.vec_dim_ok("emb", 4))
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["emb"] is not None and rows[1]["ok"]
    assert rows[2]["emb"] is None and not rows[2]["ok"]


def test_strip_html_entity_decode_order(spark):
    """&amp; decodes last: '&amp;lt;' is the literal text '&lt;', not '<'."""
    from vector_search_databricks_poc_spark.operators.text import strip_html

    df = spark.createDataFrame(
        [("use &amp;lt; for a literal less-than, &lt;b&gt;bold&lt;/b&gt;",)],
        ["t"],
    )
    got = df.select(strip_html("t").alias("s")).first()["s"]
    assert got == "use &lt; for a literal less-than, <b>bold</b>"


def test_remove_boilerplate_keeps_all_boilerplate_docs(spark):
    """A doc whose every line is boilerplate must come back with text='',
    not vanish from the corpus."""
    from vector_search_databricks_poc_spark.operators.text import (
        remove_boilerplate_lines,
    )

    rows = [(i, "SUBSCRIBE NOW TODAY!") for i in range(12)]
    rows.append((100, "SUBSCRIBE NOW TODAY!\nactual unique content here"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in
           remove_boilerplate_lines(df, min_docs=10).collect()}
    assert len(out) == 13  # every id present
    assert out[100] == "actual unique content here"
    assert all(out[i] == "" for i in range(12))


def test_assemble_context_descending_relevance(spark):
    """order_col + ascending=False formats most-relevant-first (the
    reference's prompt order); the default stays ascending by id."""
    from vector_search_databricks_poc_spark.operators.rag import assemble_context

    hits = spark.createDataFrame(
        [(1, "best", 0.95), (2, "worst", 0.10), (3, "mid", 0.5)],
        ["vec_id", "text", "score"],
    )
    ctx = assemble_context(
        hits, order_col="score", ascending=False
    ).first()["context"]
    assert ctx.index("best") < ctx.index("mid") < ctx.index("worst")


def test_has_pushed_filters_multi_scan(spark, sf_dir):
    """A filtered fact joined to an unfiltered broadcast dim: the dim's
    'PushedFilters: []' must not mask the fact scan's pushdown."""
    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.plans import audit as A

    fact = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 100)
    dim = load_table(spark, sf_dir, "customer")
    joined = fact.join(F.broadcast(dim), fact.o_custkey == dim.c_custkey)
    assert A.has_pushed_filters(joined), A.plan_string(joined)


def test_event_ts_floor_division_pre_epoch(spark):
    """Nanos->micros normalization must FLOOR like DuckDB's TIMESTAMP_NS
    cast; `div` truncation diverges by 1us on pre-epoch timestamps."""
    from vector_search_databricks_poc_spark.catalog import _normalize_event_ts

    df = spark.createDataFrame(
        [(-876543211,), (1700000000123456789,)], "ts long"
    )
    out = {r["us"] for r in _normalize_event_ts(df).select(
        F.unix_micros("ts").alias("us")).collect()}
    assert out == {-876544, 1700000000123456}


def test_mixture_without_domain_col_raises(spark):
    from vector_search_databricks_poc_spark.pipelines import (
        assemble_training_corpus,
    )

    docs = spark.createDataFrame([(1, "text here")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="domain_col"):
        assemble_training_corpus(docs, mixture={"web": 1.0})


def test_rrf_fuse_validates_inputs(spark):
    from vector_search_databricks_poc_spark.operators.hybrid import rrf_fuse

    df = spark.createDataFrame([(1, 1)], ["doc_id", "r"])
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="rank_cols"):
        rrf_fuse([df, df, df], rank_cols=["r", "r"])


def test_chunked_search_empty_query_returns_no_hits(spark):
    """A whitespace-only query embeds to the zero vector; NULL cosines
    must yield an EMPTY result, not k arbitrary docs with NULL scores."""
    from vector_search_databricks_poc_spark.pipelines import (
        chunked_search_pipeline,
    )

    docs = spark.createDataFrame(
        [(1, "some real document text " * 10), (2, "another document " * 10)],
        ["doc_id", "text"],
    )
    out = chunked_search_pipeline(spark, docs, "   ", k=5)
    assert out.count() == 0


def test_pq_fit_and_encode_survive_bad_vectors(spark):
    """PqCodebook.fit filters null/ragged vectors from the training
    sample (previously IndexError on an object array); encode() emits
    NULL codes for null / wrong-dim / null-element vectors instead of
    killing the task."""
    from pyspark.sql import Row

    from vector_search_databricks_poc_spark.functions.quantization import (
        PqCodebook,
    )

    rows = [Row(vec_id=i, embedding=[float(i), float(-i), 1.0, 2.0]) for i in range(12)]
    bad = [
        Row(vec_id=100, embedding=None),
        Row(vec_id=101, embedding=[1.0, 2.0]),            # wrong dim
        Row(vec_id=102, embedding=[1.0, None, 3.0, 4.0]),  # null element
    ]
    df = spark.createDataFrame(
        rows + bad, "vec_id long, embedding array<double>"
    )
    cb = PqCodebook.fit(df, m=2, k=4)
    out = {r["vec_id"]: r["pq_code"] for r in cb.encode(df).collect()}
    assert all(out[i] is not None and len(out[i]) == 2 for i in range(12))
    assert out[100] is None and out[101] is None and out[102] is None

    import pytest as _pytest

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="no valid vectors"):
        PqCodebook.fit(empty, m=2, k=4)


def test_train_test_split_guards(spark):
    """Fraction validation, no-empty-test floor, and NULL ids landing in
    train (they previously satisfied neither bucket predicate and
    vanished from BOTH sides)."""
    from pyspark.sql import Row

    from vector_search_databricks_poc_spark.operators.sampling import (
        train_test_split,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i) for i in range(50)] + [Row(doc_id=None)],
        "doc_id long",
    )
    train, test = train_test_split(df, "doc_id", test_fraction=0.005)
    assert test.count() > 0  # rounded-to-zero cut keeps one test bucket
    assert train.count() + test.count() == 51  # NULL id kept (in train)
    assert train.where(F.col("doc_id").isNull()).count() == 1
    with pytest.raises(ValueError, match="test_fraction"):
        train_test_split(df, "doc_id", test_fraction=1.5)


def test_session_windows_batch_custom_tiebreak_col(spark):
    from pyspark.sql import Row

    from vector_search_databricks_poc_spark.streaming.windows import (
        session_windows_batch,
    )

    df = spark.createDataFrame(
        [
            Row(uid=1, t=_ts("2024-01-01 10:00:00"), seq=1),
            Row(uid=1, t=_ts("2024-01-01 12:00:00"), seq=2),
        ]
    )
    out = session_windows_batch(
        df, gap_minutes=30, ts_col="t", key_col="uid", tiebreak_col="seq"
    )
    assert out.count() == 2  # two sessions, no event_id column required
