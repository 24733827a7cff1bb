"""Pipeline assembly (§3.1/§3.2), bucketed/salted joins (B14 scale),
stateful streaming (B20/B22)."""

import pytest
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.plans import audit as A


def test_build_and_search_pipeline(spark, sf_dir, tmp_path):
    from vector_search_databricks_poc_spark.pipelines import (
        build_index_pipeline,
        search_pipeline,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = build_index_pipeline(docs, str(tmp_path / "idx"), k_centroids=4, dim=32)
    # index table is partitioned by centroid
    import os

    parts = [p for p in os.listdir(idx.path) if p.startswith("centroid_id=")]
    assert len(parts) >= 2

    # search with a query that IS a corpus document -> that document must
    # be the top hit and appear in the context
    target = docs.where(F.col("doc_id") == 42).first()["text"]
    ctx = search_pipeline(
        spark, idx, docs, target, k=3, nprobe=4, dim=32
    ).first()["context"]
    assert ctx != "No relevant context found."
    assert "[42]" in ctx

    # garbage query still returns a well-formed (possibly fallback) context
    ctx2 = search_pipeline(spark, idx, docs, "zzz qqq www", k=3, nprobe=2, dim=32).first()[
        "context"
    ]
    assert isinstance(ctx2, str) and len(ctx2) > 0


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    from vector_search_databricks_poc_spark.operators.joins import (
        bucketed_join,
        save_bucketed,
    )

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    save_bucketed(li, "li_b", "l_orderkey", num_buckets=4)
    save_bucketed(
        od.withColumnRenamed("o_orderkey", "l_orderkey"), "od_b", "l_orderkey", num_buckets=4
    )
    joined = bucketed_join(spark, "li_b", "od_b", on="l_orderkey")
    # co-located: no shuffle exchange on either side
    assert A.count_exchanges(joined) == 0, A.plan_string(joined, "simple")
    # and correct
    expect = li.join(od, li["l_orderkey"] == od["o_orderkey"]).count()
    assert joined.count() == expect
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")


def test_salted_join_correctness(spark, sf_dir):
    from vector_search_databricks_poc_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(od, on="l_orderkey").agg(F.count("*")).first()[0]
    salted = salted_join(li, od, on="l_orderkey", salt=4).agg(F.count("*")).first()[0]
    assert salted == plain


def test_stateful_running_user_stats(spark, sf_dir):
    import uuid

    from vector_search_databricks_poc_spark.queries_registry import _events_stream
    from vector_search_databricks_poc_spark.streaming.stateful import running_user_stats

    stream = _events_stream(spark, sf_dir)
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table(name)
    # one update row per user per micro-batch; the LAST row per user must
    # equal the batch ground truth
    ev = load_table(spark, sf_dir, "events")
    truth = {
        r["user_id"]: (r["n"], round(r["tv"], 2))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 2))
        for r in out.orderBy("n_events").collect()  # later updates overwrite
    }
    assert len(got) == len(truth)
    for uid, (n, tv) in truth.items():
        gn, gtv = got[uid]
        assert gn == n, (uid, gn, n)
        assert abs(gtv - tv) < 0.05, (uid, gtv, tv)


def test_prepare_training_data_pipeline(spark, sf_dir):
    """North-star composition: clean -> lang filter -> quality filter ->
    exact dedup -> near-dup removal -> deterministic split, with planted
    junk verifying each stage."""
    from pyspark.sql import Row

    from vector_search_databricks_poc_spark.pipelines import prepare_training_data

    base = load_table(spark, sf_dir, "documents")
    keep_cols = base.columns
    some = base.where(F.col("lang") == "en").limit(3).collect()
    planted = spark.createDataFrame(
        [
            # exact duplicate of an en doc (higher id -> dropped by keeper)
            Row(**{**some[0].asDict(), "doc_id": 90001}),
            # near-duplicate: one word changed
            Row(**{**some[1].asDict(), "doc_id": 90002,
                   "text": some[1]["text"].replace(some[1]["text"].split()[0], "XQJZ", 1)}),
            # junk: empty-ish text
            Row(**{**some[2].asDict(), "doc_id": 90003, "text": "   "}),
        ]
    ).select(*keep_cols)
    docs = base.unionByName(planted)

    train, test = prepare_training_data(
        docs, langs=("en",), min_quality=0.0, near_dup_threshold=0.5,
        test_fraction=0.2,
    )
    out = train.unionByName(test).select("doc_id", "lang").cache()
    ids = {r["doc_id"] for r in out.collect()}
    assert 90001 not in ids          # exact dup dropped (keeper = min id)
    assert some[0]["doc_id"] in ids
    assert 90002 not in ids          # near-dup dropped (greedy keeps min id)
    assert some[1]["doc_id"] in ids
    assert 90003 not in ids          # junk text filtered
    assert {r["lang"] for r in out.collect()} == {"en"}

    # split is deterministic and disjoint
    t2, s2 = prepare_training_data(
        docs, langs=("en",), min_quality=0.0, near_dup_threshold=0.5,
        test_fraction=0.2,
    )
    assert train.select("doc_id").exceptAll(t2.select("doc_id")).count() == 0
    assert train.join(test, "doc_id", "inner").count() == 0
    n_train, n_test = train.count(), test.count()
    assert n_test > 0 and n_train > 3 * n_test  # ~80/20


def test_prepare_training_data_quality_keeper(spark, sf_dir):
    """cluster_keeper='quality': the near-dup cluster keeps its
    highest-quality member even when that is NOT the min id, and the
    option is rejected without cluster_exact."""
    from pyspark.sql import Row

    from vector_search_databricks_poc_spark.operators.text import quality_score
    from vector_search_databricks_poc_spark.pipelines import prepare_training_data

    base = load_table(spark, sf_dir, "documents")
    keep_cols = base.columns
    donor = base.where(F.col("lang") == "en").limit(1).collect()[0]
    clean = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "through the wide green field with great speed before the rain"
    )
    junk = " ".join(["Z" * 100] * 5)  # blows avg token length past 15
    # LOWER id gets the degraded copy: min-id keeping would ship the junk
    degraded = Row(**{**donor.asDict(), "doc_id": 91001, "lang": "en",
                      "text": clean + " " + junk})
    better = Row(**{**donor.asDict(), "doc_id": 91002, "lang": "en",
                    "text": clean})
    plants = spark.createDataFrame([degraded, better]).select(*keep_cols)
    docs = base.unionByName(plants)
    qs = {
        r["doc_id"]: r["q"]
        for r in plants.select("doc_id", quality_score("text").alias("q")).collect()
    }
    assert qs[91002] > qs[91001], qs  # the higher id really is better

    train, test = prepare_training_data(
        docs, langs=("en",), min_quality=0.0, near_dup_threshold=0.5,
        cluster_exact=True, cluster_keeper="quality",
    )
    ids = {r["doc_id"] for r in train.unionByName(test).select("doc_id").collect()}
    assert 91002 in ids and 91001 not in ids

    # min_id policy keeps the degraded copy instead (same input, flipped policy)
    tr2, te2 = prepare_training_data(
        docs, langs=("en",), min_quality=0.0, near_dup_threshold=0.5,
        cluster_exact=True, cluster_keeper="min_id",
    )
    ids2 = {r["doc_id"] for r in tr2.unionByName(te2).select("doc_id").collect()}
    assert 91001 in ids2 and 91002 not in ids2

    with pytest.raises(ValueError, match="cluster_exact"):
        prepare_training_data(docs, cluster_keeper="quality")
    with pytest.raises(ValueError, match="cluster_keeper"):
        prepare_training_data(docs, cluster_exact=True, cluster_keeper="longest")


def test_chunk_embed_search_composition(spark, sf_dir):
    """Passage-level retrieval: chunk docs -> embed chunks -> top-k against
    a chunk query -> map hits back to parent docs.  The chunk containing
    the query text must rank first with score 1.0."""
    from vector_search_databricks_poc_spark.functions.embedding import embed_text
    from vector_search_databricks_poc_spark.operators.text import chunk_documents
    from vector_search_databricks_poc_spark.operators.topk import top_k_similar

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    chunks = chunk_documents(docs, chunk_tokens=16, overlap=4)
    embedded = embed_text(
        chunks.withColumn(
            "chunk_id", F.col("doc_id") * 1000 + F.col("chunk_seq")
        ),
        text_col="chunk_text",
        dim=32,
    )
    target = chunks.where((F.col("doc_id") == 7) & (F.col("chunk_seq") == 1)).first()
    qvec = list(
        embed_text(
            spark.createDataFrame([(target["chunk_text"],)], ["chunk_text"]),
            text_col="chunk_text",
            dim=32,
        ).first()["embedding"]
    )
    hits = top_k_similar(embedded, qvec, k=3, id_col="chunk_id").collect()
    assert hits[0]["chunk_id"] == 7 * 1000 + 1
    assert hits[0]["score"] == 1.0


def test_chunked_search_pipeline_planted_passage(spark):
    """A doc containing the query passage ranks first by a clear margin and
    reports the containing chunk as provenance, even when the doc is long
    and mostly unrelated (the dilution problem whole-doc embedding has).
    Chunk windows need not align exactly with the passage, so the contract
    is ranking + margin, not score == 1."""
    from vector_search_databricks_poc_spark.pipelines import chunked_search_pipeline

    filler = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 20
    needle = "quantum flux capacitor calibration manual"
    docs = spark.createDataFrame(
        [
            (1, filler + " " + needle + " " + filler),
            (2, filler),
            (3, "short unrelated document about cooking"),
        ],
        ["doc_id", "text"],
    )
    out = chunked_search_pipeline(
        spark, docs, needle, k=3, chunk_tokens=8, overlap=2
    ).collect()
    assert out[0]["doc_id"] == 1
    assert needle.split()[0] in out[0]["best_chunk_text"]
    assert out[0]["score"] > 0.5
    assert out[0]["score"] > out[1]["score"] + 0.3


def test_chunked_search_rollup_equals_max_over_chunks(spark, sf_dir):
    """Exact-MaxSim contract: every returned doc score equals the max
    cosine over that doc's chunks, computed independently."""
    from vector_search_databricks_poc_spark import vectors as V
    from vector_search_databricks_poc_spark.functions.embedding import embed_text
    from vector_search_databricks_poc_spark.operators.text import chunk_documents
    from vector_search_databricks_poc_spark.pipelines import chunked_search_pipeline

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    query = "vector search embedding index"
    out = chunked_search_pipeline(
        spark, docs, query, k=5, chunk_tokens=16, overlap=4, dim=32
    ).collect()
    # independent recomputation of per-chunk scores
    chunks = chunk_documents(docs, chunk_tokens=16, overlap=4)
    emb = embed_text(chunks, text_col="chunk_text", dim=32)
    qv = embed_text(
        spark.createDataFrame([(query,)], ["t"]), text_col="t", dim=32
    ).first()["embedding"]
    scored = emb.select(
        "doc_id",
        F.round(V.cosine("embedding", F.array(*[F.lit(float(x)) for x in qv])), 6).alias("s"),
    )
    expected = {
        r["doc_id"]: r["m"]
        for r in scored.groupBy("doc_id").agg(F.max("s").alias("m")).collect()
    }
    for r in out:
        assert r["score"] == expected[r["doc_id"]], (r["doc_id"], r["score"])


def test_indexed_chunked_search_full_probe_matches_brute_force(spark, sf_dir, tmp_path):
    """nprobe = k_centroids makes the indexed chunk probe exhaustive, so
    the MaxSim rollup must return the same docs in the same order as the
    brute-force chunked_search_pipeline, with scores equal to float32-
    normalization precision (the index stores unit float32 vectors; the
    brute path divides double dot products)."""
    from vector_search_databricks_poc_spark.pipelines import (
        build_chunk_index,
        chunked_search_pipeline,
        indexed_chunked_search,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(80)
    query = "vector search embedding index"
    idx = build_chunk_index(
        spark, docs, str(tmp_path / "chunks"),
        chunk_tokens=16, overlap=4, dim=32, k_centroids=4,
    )
    brute = chunked_search_pipeline(
        spark, docs, query, k=5, chunk_tokens=16, overlap=4, dim=32
    ).collect()
    indexed = indexed_chunked_search(
        spark, idx, query, k=5, nprobe=4, dim=32
    ).collect()
    assert [r["doc_id"] for r in indexed] == [r["doc_id"] for r in brute]
    for a, b in zip(indexed, brute):
        assert a["score"] == pytest.approx(b["score"], abs=5e-4)
        assert a["best_chunk_seq"] == b["best_chunk_seq"]
        assert a["best_chunk_text"] == b["best_chunk_text"]


def test_indexed_chunked_search_planted_passage_small_probe(spark, tmp_path):
    """The planted-passage contract survives the indexed path with a
    PARTIAL probe: the needle doc's best chunk is so much closer to the
    query than anything else that its partition is always probed first."""
    from vector_search_databricks_poc_spark.pipelines import (
        build_chunk_index,
        indexed_chunked_search,
    )

    filler = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 20
    needle = "quantum flux capacitor calibration manual"
    docs = spark.createDataFrame(
        [
            (1, filler + " " + needle + " " + filler),
            (2, filler),
            (3, "short unrelated document about cooking"),
        ],
        ["doc_id", "text"],
    )
    idx = build_chunk_index(
        spark, docs, str(tmp_path / "chunks"),
        chunk_tokens=8, overlap=2, dim=64, k_centroids=4,
    )
    out = indexed_chunked_search(spark, idx, needle, k=3, nprobe=2, dim=64).collect()
    assert out and out[0]["doc_id"] == 1
    assert needle.split()[0] in out[0]["best_chunk_text"]
    assert out[0]["score"] > 0.5


def test_chunk_index_is_maintainable(spark, sf_dir, tmp_path):
    """The chunk index is an ordinary IVF table: balance report and
    compaction apply unchanged (the maintenance surface composes with the
    passage-granularity layout)."""
    from vector_search_databricks_poc_spark.operators.incremental import (
        index_balance_report,
    )
    from vector_search_databricks_poc_spark.pipelines import build_chunk_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(40)
    idx = build_chunk_index(
        spark, docs, str(tmp_path / "chunks"),
        chunk_tokens=16, overlap=4, dim=32, k_centroids=4,
    )
    rep = index_balance_report(spark, idx).collect()
    assert len(rep) == 4
    n_chunks = spark.read.parquet(idx.path).count()
    assert sum(r["n_rows"] for r in rep) == n_chunks > 40  # > one chunk per doc


def test_prepare_training_data_gopher_gate(spark):
    """With gopher_gate on, a degenerate looping document is dropped
    BEFORE cleaning flattens its line structure; with the gate off it
    survives the heuristic quality filter (which only checks length/
    stopword/shape) — the gate adds real filtering power."""
    from vector_search_databricks_poc_spark.pipelines import prepare_training_data

    clean_body = " ".join(
        "the quick brown fox jumps over a lazy dog near riverbank".split()
    )
    docs = spark.createDataFrame(
        [
            (i, f"{clean_body} unique tail {i} with several extra words", "en")
            for i in range(20)
        ]
        + [(99, "spam the offer now\n" * 30, "en")],  # dup-line degenerate
        ["doc_id", "text", "lang"],
    )
    kw = dict(langs=("en",), min_quality=0.0, near_dup_threshold=0.95,
              test_fraction=0.05)
    train_off, test_off = prepare_training_data(docs, **kw)
    ids_off = {r["doc_id"] for r in
               train_off.unionByName(test_off).select("doc_id").collect()}
    assert 99 in ids_off  # heuristic quality filter alone keeps it
    train_on, test_on = prepare_training_data(docs, gopher_gate=True, **kw)
    ids_on = {r["doc_id"] for r in
              train_on.unionByName(test_on).select("doc_id").collect()}
    assert 99 not in ids_on
    assert ids_on == ids_off - {99}


def test_prepare_training_data_dsir_stage(spark, sf_dir):
    """DSIR selection as the pipeline's last corpus transform: exactly
    dsir_n survivors (train+test), each carrying its dsir_score, and the
    target-language docs dominate the kept set."""
    from vector_search_databricks_poc_spark.pipelines import prepare_training_data

    docs = load_table(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en").limit(50)
    train, test = prepare_training_data(
        docs,
        langs=("en", "fr", "de", "es", "zh"),
        min_quality=0.0,
        near_dup_threshold=0.9,
        dsir_target=target,
        dsir_n=60,
        dsir_buckets=1024,
    )
    out = train.unionByName(test)
    assert "dsir_score" in out.columns
    rows = out.select("doc_id", "lang", "dsir_score").collect()
    assert len(rows) == 60
    en = sum(1 for r in rows if r["lang"] == "en")
    assert en > 40  # the en-targeted fit must prefer en docs

    with pytest.raises(ValueError):
        prepare_training_data(docs, dsir_target=target)  # n missing


def test_assemble_training_corpus_semdedup_stage(spark, sf_dir):
    """SemDeDup as the assembly head: a planted exact-copy embedding is
    collapsed to one survivor before mixing/packing."""
    from vector_search_databricks_poc_spark.pipelines import assemble_training_corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(80)
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    base = docs.join(emb, "doc_id")
    v0 = base.where(F.col("doc_id") == 0).first()
    dupe = spark.createDataFrame(
        [(90001, v0["text"], list(v0["embedding"]))],
        "doc_id long, text string, embedding array<float>",
    )
    corpus = base.unionByName(dupe)
    out = assemble_training_corpus(
        corpus,
        redact=False,
        vec_col="embedding",
        semdedup_eps=0.999,
        semdedup_clusters=8,
        pack_budget=64,
        pack_groups=4,
        n_shards=8,
    )
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert len({0, 90001} & ids) == 1  # the copy pair collapsed
    assert {"pack_id", "shard"} <= set(out.columns)

    with pytest.raises(ValueError):
        assemble_training_corpus(corpus, vec_col="embedding")  # eps missing


def test_prepare_training_data_decontamination_stage(spark, sf_dir):
    """decontam_benchmark drops exactly the docs sharing a 13-gram with
    the benchmark; everything else survives unchanged."""
    from vector_search_databricks_poc_spark.pipelines import prepare_training_data

    docs = load_table(spark, sf_dir, "documents")
    # benchmark = a 13-token span lifted verbatim from one en doc
    victim = docs.where(F.col("lang") == "en").limit(1).collect()[0]
    span = " ".join(victim["text"].split()[:13])
    bench = spark.createDataFrame([(span,)], "text string")

    base_train, base_test = prepare_training_data(
        docs, langs=("en",), min_quality=0.0, near_dup_threshold=0.5,
    )
    base_ids = {r["doc_id"] for r in base_train.unionByName(base_test)
                .select("doc_id").collect()}
    assert victim["doc_id"] in base_ids  # in-corpus without the stage

    train, test = prepare_training_data(
        docs, langs=("en",), min_quality=0.0, near_dup_threshold=0.5,
        decontam_benchmark=bench,
    )
    ids = {r["doc_id"] for r in train.unionByName(test).select("doc_id").collect()}
    assert victim["doc_id"] not in ids
    assert ids == base_ids - {victim["doc_id"]}
