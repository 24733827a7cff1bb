"""Streaming index sync: build on half the corpus, stream the rest in,
search must then find streamed documents."""

import os

from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.functions.embedding import embed_text
from vector_search_databricks_poc_spark.operators.index import build_ivf_index
from vector_search_databricks_poc_spark.streaming.index_sync import stream_index_sync


def test_stream_index_sync(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first = docs.where(F.col("doc_id") < 250)
    rest = docs.where(F.col("doc_id") >= 250)

    # initial index from the first half (hashing encoder, dim 32)
    emb_first = embed_text(first, dim=32).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    idx = build_ivf_index(emb_first, str(tmp_path / "idx"), k_centroids=4)
    n0 = spark.read.parquet(idx.path).count()
    assert n0 == first.count()

    # stage the second half as files and stream them through the sync
    stage = str(tmp_path / "incoming")
    rest.write.parquet(stage)
    stream = spark.readStream.schema(rest.schema).parquet(stage)
    q = stream_index_sync(
        stream.withColumnRenamed("doc_id", "vec_id"),
        idx,
        id_col="vec_id",
        dim=32,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    total = spark.read.parquet(idx.path)
    assert total.count() == docs.count()
    # partitions only grew where batch rows landed; layout still centroid-partitioned
    assert any(p.startswith("centroid_id=") for p in os.listdir(idx.path))

    # a streamed document is findable: query with its own embedding
    target_text = rest.where(F.col("doc_id") == 400).first()["text"]
    qvec = list(
        embed_text(spark.createDataFrame([(target_text,)], ["text"]), dim=32)
        .first()["embedding"]
    )
    hits = idx.search(spark, qvec, k=3, nprobe=4).collect()
    assert hits and hits[0]["vec_id"] == 400 and hits[0]["score"] == 1.0


def test_incremental_upsert_propagates_updates(spark, sf_dir, tmp_path):
    """B21 with UPDATES, not just appends (the Delta-CDF semantics the
    reference gets from delta.enableChangeDataFeed): a changed row replaces
    its old index entry — even when the new vector moves it to a different
    centroid partition — and untouched partitions keep their files."""
    import glob

    from vector_search_databricks_poc_spark.operators.incremental import (
        incremental_upsert,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = build_ivf_index(e, str(tmp_path / "idx"), k_centroids=4)
    n0 = spark.read.parquet(idx.path).count()
    files_before = {
        p: set(glob.glob(os.path.join(idx.path, p, "*.parquet")))
        for p in os.listdir(idx.path)
        if p.startswith("centroid_id=")
    }

    # update vec 3: replace its embedding with vec 7's (likely a different
    # centroid); insert a brand-new vec 900001 with vec 11's embedding
    v7 = e.where(F.col("vec_id") == 7).first()["embedding"]
    v11 = e.where(F.col("vec_id") == 11).first()["embedding"]
    changed = spark.createDataFrame(
        [(3, list(v7)), (900001, list(v11))], "vec_id long, embedding array<float>"
    )
    n_up = incremental_upsert(spark, idx, changed)
    assert n_up == 2

    after = spark.read.parquet(idx.path)
    assert after.count() == n0 + 1  # one insert, one in-place update
    # no duplicate entry for the updated id
    assert after.where(F.col("vec_id") == 3).count() == 1
    # the updated row now scores 1.0 against its new vector (unit-norm dot)
    hits = idx.search(spark, list(v7), k=3, nprobe=4).collect()
    top_ids = {h["vec_id"] for h in hits if h["score"] == hits[0]["score"]}
    assert 3 in top_ids and 7 in top_ids
    # untouched partitions kept their files (rewrite cost ~ change set)
    files_after = {
        p: set(glob.glob(os.path.join(idx.path, p, "*.parquet")))
        for p in os.listdir(idx.path)
        if p.startswith("centroid_id=")
    }
    untouched = [p for p in files_before if files_before[p] == files_after.get(p)]
    assert untouched, "dynamic partition overwrite rewrote every partition"


def _two_cluster_index(spark, tmp_path, name="idx2"):
    """Index over two well-separated clusters -> exactly 2 centroid
    partitions, one per cluster (KMeans can't merge them at k=2)."""
    rows = [(i, [1.0, 0.0, 0.0, float(i) * 1e-3]) for i in range(10)]
    rows += [(i, [0.0, 1.0, 0.0, float(i - 10) * 1e-3]) for i in range(10, 20)]
    src = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = build_ivf_index(src, str(tmp_path / name), k_centroids=2)
    return src, idx


def test_incremental_upsert_cleans_emptied_partition(spark, tmp_path):
    """ADVICE r2 (medium): if every old row of a touched partition is
    updated away and nothing new lands there, dynamic partition overwrite
    never rewrites it — the stale entries must be deleted explicitly, or
    the moved ids stay findable twice."""
    from vector_search_databricks_poc_spark.operators.incremental import (
        incremental_upsert,
    )

    src, idx = _two_cluster_index(spark, tmp_path)
    parts_before = {p for p in os.listdir(idx.path) if p.startswith("centroid_id=")}
    assert len(parts_before) == 2

    # move EVERY cluster-A row onto cluster B's direction: A's partition
    # empties, receives nothing
    changed = spark.createDataFrame(
        [(i, [0.0, 1.0, 0.0, float(i) * 1e-3]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    n = incremental_upsert(spark, idx, changed)
    assert n == 10

    after = spark.read.parquet(idx.path)
    assert after.count() == 20  # no stale survivors
    dupes = after.groupBy("vec_id").count().where(F.col("count") > 1).count()
    assert dupes == 0, "updated ids appear twice — stale partition survived"
    # the emptied partition directory is gone
    parts_after = {p for p in os.listdir(idx.path) if p.startswith("centroid_id=")}
    assert len(parts_after) == 1
    # the old vector is no longer findable: nothing scores ~1.0 against
    # cluster A's direction anymore
    hits = idx.search(spark, [1.0, 0.0, 0.0, 0.0], k=3, nprobe=2).collect()
    assert all(h["score"] < 0.9 for h in hits)


def test_incremental_upsert_propagates_deletes(spark, tmp_path):
    """VERDICT r2 #4: CDF delete tombstones — a row removed from the source
    disappears from the index (and from search results)."""
    from vector_search_databricks_poc_spark.operators.incremental import (
        incremental_upsert,
    )

    src, idx = _two_cluster_index(spark, tmp_path, name="idx_del")
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    gone = spark.createDataFrame([(5,), (15,)], "vec_id long")
    n = incremental_upsert(spark, idx, empty, deleted=gone)
    assert n == 0  # deletes aren't counted as upserts

    after = spark.read.parquet(idx.path)
    assert after.count() == 18
    assert after.where(F.col("vec_id").isin(5, 15)).count() == 0
    # the deleted row's exact vector no longer finds it
    v5 = [1.0, 0.0, 0.0, 5e-3]
    hits = idx.search(spark, v5, k=3, nprobe=2).collect()
    assert all(h["vec_id"] != 5 for h in hits)
    # mixed batch: update one survivor AND delete another in one call
    changed = spark.createDataFrame(
        [(7, [0.0, 1.0, 0.0, 7e-3])], "vec_id long, embedding array<float>"
    )
    n2 = incremental_upsert(
        spark, idx, changed, deleted=spark.createDataFrame([(16,)], "vec_id long")
    )
    assert n2 == 1
    after2 = spark.read.parquet(idx.path)
    assert after2.count() == 17
    assert after2.where(F.col("vec_id") == 16).count() == 0
    assert after2.where(F.col("vec_id") == 7).count() == 1


def test_change_log_replay_reaches_batch_state(spark, tmp_path):
    """Self-written change log (VERDICT r3 #5, closes the Delta-CDF gap
    without delta-spark): three mixed batches applied with logging, then a
    SECOND index — built from the same pre-image — replays only the
    ``_changes`` parquet via stream_change_log_sync and must reach the
    exact same (vec_id, embedding, centroid_id) contents."""
    from vector_search_databricks_poc_spark.operators.incremental import (
        changes_path,
        incremental_upsert,
    )
    from vector_search_databricks_poc_spark.streaming.index_sync import (
        stream_change_log_sync,
    )

    src, idx_a = _two_cluster_index(spark, tmp_path, name="idx_log_a")
    log = changes_path(idx_a.path)

    # batch 1: update 3 (moves cluster), insert 100
    b1 = spark.createDataFrame(
        [(3, [0.0, 1.0, 0.0, 3e-3]), (100, [1.0, 0.0, 0.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    assert incremental_upsert(spark, idx_a, b1, log_path=log) == 2
    # batch 2: delete 5 and 15
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    gone = spark.createDataFrame([(5,), (15,)], "vec_id long")
    incremental_upsert(spark, idx_a, empty, deleted=gone, log_path=log)
    # batch 3: update 100 again (insert-then-update across batches),
    # delete 7 while also re-updating it -> logs as update, row survives
    b3 = spark.createDataFrame(
        [(100, [0.0, 1.0, 0.0, 0.25]), (7, [1.0, 0.0, 0.0, 7e-3])],
        "vec_id long, embedding array<float>",
    )
    incremental_upsert(
        spark, idx_a, b3,
        deleted=spark.createDataFrame([(7,)], "vec_id long"), log_path=log,
    )

    logged = spark.read.parquet(log)
    ops = {(r.vec_id, r.batch_seq): r.op for r in logged.collect()}
    assert ops[(3, 0)] == "update" and ops[(100, 0)] == "insert"
    assert ops[(5, 1)] == "delete" and ops[(15, 1)] == "delete"
    assert ops[(100, 2)] == "update" and ops[(7, 2)] == "update"
    assert (7, 2) in ops and not any(
        op == "delete" and k[0] == 7 for k, op in ops.items()
    )

    # replay: fresh index from the same pre-image + the log only
    _, idx_b = _two_cluster_index(spark, tmp_path, name="idx_log_b")
    # post-image source = what the rows look like NOW
    post = {r.vec_id: list(r.embedding) for r in src.collect()}
    post.update({3: [0.0, 1.0, 0.0, 3e-3], 100: [0.0, 1.0, 0.0, 0.25],
                 7: [1.0, 0.0, 0.0, 7e-3]})
    for d in (5, 15):
        post.pop(d)
    post_df = spark.createDataFrame(
        [(k, v) for k, v in sorted(post.items())],
        "vec_id long, embedding array<float>",
    )
    q = stream_change_log_sync(
        idx_b, post_df, log, checkpoint_dir=str(tmp_path / "log_ckpt")
    )
    q.awaitTermination(120)

    def contents(path):
        return sorted(
            (r.vec_id, tuple(round(x, 6) for x in r.embedding), r.centroid_id)
            for r in spark.read.parquet(path).collect()
        )

    assert contents(idx_b.path) == contents(idx_a.path)
    # the replayed index must not have written its own change log
    import os as _os

    assert not _os.path.exists(changes_path(idx_b.path))


def test_high_watermark_schema_error_propagates(spark, tmp_path):
    """Only a MISSING table reads as 'no watermark'; an unresolved id
    column (schema drift / wrong id_col) must raise, not silently reset
    the sync and re-append the whole corpus (review finding r4)."""
    import pytest
    from pyspark.errors import AnalysisException

    from vector_search_databricks_poc_spark.operators.incremental import (
        high_watermark,
    )

    assert high_watermark(spark, str(tmp_path / "nope"), "vec_id") is None
    spark.range(5).selectExpr("id AS vec_id").write.parquet(str(tmp_path / "t"))
    with pytest.raises(AnalysisException):
        high_watermark(spark, str(tmp_path / "t"), "doc_id")


def test_upsert_skips_invalid_vectors_like_build(spark, tmp_path):
    """A null or wrong-dimension vector in the change set must be SKIPPED
    (the build-time guard), never written into the Hive default
    partition where pruned probes cannot see it."""
    from pyspark.sql import Row

    from vector_search_databricks_poc_spark.operators.incremental import (
        incremental_upsert,
    )
    from vector_search_databricks_poc_spark.operators.index import build_ivf_index

    base = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(8)]
    )
    idx = build_ivf_index(base, str(tmp_path / "idx"), k_centroids=2)
    changed = spark.createDataFrame(
        [
            Row(vec_id=3, embedding=[9.0, 9.0]),      # valid update
            Row(vec_id=4, embedding=None),             # null vector
            Row(vec_id=5, embedding=[1.0, 2.0, 3.0]),  # wrong dim
        ],
        "vec_id long, embedding array<double>",
    )
    n = incremental_upsert(spark, idx, changed)
    assert n == 1
    table = spark.read.parquet(idx.path)
    assert table.where(F.col("centroid_id").isNull()).count() == 0
    assert table.count() == 8  # 3 replaced; 4 and 5 keep their old entries
    assert not os.path.exists(
        f"{idx.path}/centroid_id=__HIVE_DEFAULT_PARTITION__"
    )


def test_upsert_preserves_payload_columns(spark, tmp_path):
    """extra_cols payload must survive partition rewrites — and a change
    set missing the payload column fails loudly instead of silently
    stripping it from survivors (review finding r4)."""
    import pytest
    from pyspark.sql import Row

    from vector_search_databricks_poc_spark.operators.incremental import (
        incremental_upsert,
    )
    from vector_search_databricks_poc_spark.operators.index import build_ivf_index

    base = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0], lang="en" if i % 2 else "de")
         for i in range(8)]
    )
    idx = build_ivf_index(
        base, str(tmp_path / "idx"), k_centroids=2, extra_cols=("lang",)
    )
    changed = spark.createDataFrame(
        [Row(vec_id=3, embedding=[9.0, 9.0], lang="fr")]
    )
    assert incremental_upsert(spark, idx, changed) == 1
    table = spark.read.parquet(idx.path)
    langs = {r["vec_id"]: r["lang"] for r in table.collect()}
    assert langs[3] == "fr" and langs[2] in ("en", "de")
    assert None not in langs.values()
    with pytest.raises(ValueError, match="payload columns"):
        incremental_upsert(
            spark, idx,
            spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 1.0])]),
        )


def test_stream_sync_batch_replay_is_idempotent(spark, tmp_path):
    """The foreachBatch body must dedupe a replayed batch_id via the
    marker parquet — a crash between checkpoint commits otherwise appends
    the same micro-batch twice (review finding r4)."""
    from pyspark.sql import Row

    from vector_search_databricks_poc_spark.operators.index import build_ivf_index
    from vector_search_databricks_poc_spark.streaming.index_sync import _sync_batch

    base = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(4)]
    )
    idx = build_ivf_index(base, str(tmp_path / "idx"), k_centroids=2)
    batch = spark.createDataFrame([Row(vec_id=100, embedding=[0.5, 0.5])])
    _sync_batch(batch, 7, idx)
    _sync_batch(batch, 7, idx)  # replay of the SAME micro-batch
    assert spark.read.parquet(idx.path).where("vec_id = 100").count() == 1
    _sync_batch(batch.selectExpr("vec_id + 1 AS vec_id", "embedding"), 8, idx)
    assert spark.read.parquet(idx.path).count() == 6


def test_stream_index_sync_rejects_dim_mismatch(spark, tmp_path):
    """dim != the index's centroid dim would NULL every assignment and
    dump the stream into the default partition — fail loudly instead."""
    import pytest
    from pyspark.sql import Row

    from vector_search_databricks_poc_spark.operators.index import build_ivf_index
    from vector_search_databricks_poc_spark.streaming.index_sync import (
        stream_index_sync,
    )

    base = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i)] * 32) for i in range(4)]
    )
    idx = build_ivf_index(base, str(tmp_path / "idx"), k_centroids=2)
    stage = tmp_path / "incoming"
    spark.createDataFrame([Row(doc_id=1, text="hello")]).write.parquet(str(stage))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(stage))
    with pytest.raises(ValueError, match="centroid dim"):
        stream_index_sync(stream, idx, dim=64)


def test_jsonl_quarantine_counts_both_legs(spark, tmp_path):
    """bad.count()/good.count() must work (QUERY_ONLY_CORRUPT_RECORD_COLUMN
    is avoided by the lazy localCheckpoint — review findings r4) and the
    two legs must partition the file exactly, WITHOUT pinning anything in
    the catalog cache (review finding r4 follow-up: the earlier .cache()
    leaked a cached frame per call)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from vector_search_databricks_poc_spark.sources.files import (
        read_jsonl_quarantine,
    )

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"id": 2, "text": "fine"}\n'
        '{"id": broken\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("text", StringType())]
    )
    spark.catalog.clearCache()  # clean slate for the residency assert below
    good, bad = read_jsonl_quarantine(spark, str(p), schema)
    assert good.count() == 2
    assert bad.count() == 2
    assert {r["id"] for r in good.collect()} == {1, 2}
    assert all(r["raw_line"] for r in bad.collect())
    # no catalog-cache residency: the checkpoint must not register a cached
    # query (storage blocks are ContextCleaner-managed instead)
    jcat = spark._jsparkSession.sharedState().cacheManager()
    assert jcat.isEmpty(), "read_jsonl_quarantine must not pin catalog cache"


def test_truncate_change_log_retention(spark, tmp_path):
    """Log retention: batches <= up_to_seq drop; replaying the truncated
    log onto a pre-image that already includes them reaches the exact
    state of the full-log replay; dropping the newest batch is refused."""
    import pytest

    from vector_search_databricks_poc_spark.operators.incremental import (
        changes_path,
        incremental_upsert,
        truncate_change_log,
    )
    from vector_search_databricks_poc_spark.streaming.index_sync import (
        stream_change_log_sync,
    )

    src, idx_a = _two_cluster_index(spark, tmp_path, name="idx_trunc_a")
    log = changes_path(idx_a.path)
    b1 = spark.createDataFrame(
        [(3, [0.0, 1.0, 0.0, 3e-3]), (100, [1.0, 0.0, 0.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    incremental_upsert(spark, idx_a, b1, log_path=log)  # seq 0
    gone = spark.createDataFrame([(5,)], "vec_id long")
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    incremental_upsert(spark, idx_a, empty, deleted=gone, log_path=log)  # seq 1
    b3 = spark.createDataFrame(
        [(100, [0.0, 1.0, 0.0, 0.25])], "vec_id long, embedding array<float>"
    )
    incremental_upsert(spark, idx_a, b3, log_path=log)  # seq 2

    # refusal: dropping everything would reset sequence numbering
    with pytest.raises(ValueError, match="newest batch"):
        truncate_change_log(spark, log, up_to_seq=2)

    # drop seq 0 (2 rows); seqs 1-2 survive
    assert truncate_change_log(spark, log, up_to_seq=0) == 2
    left = spark.read.parquet(log)
    assert {r.batch_seq for r in left.collect()} == {1, 2}

    # consumer whose pre-image already includes batch 0: replay the
    # truncated log, must reach idx_a's exact state
    _, idx_b = _two_cluster_index(spark, tmp_path, name="idx_trunc_b")
    incremental_upsert(spark, idx_b, b1)  # apply batch 0, NO log
    post = {r.vec_id: list(r.embedding) for r in src.collect()}
    post.update({3: [0.0, 1.0, 0.0, 3e-3], 100: [0.0, 1.0, 0.0, 0.25]})
    post.pop(5)
    post_df = spark.createDataFrame(
        [(k, v) for k, v in sorted(post.items())],
        "vec_id long, embedding array<float>",
    )
    q = stream_change_log_sync(
        idx_b, post_df, log, checkpoint_dir=str(tmp_path / "trunc_ckpt")
    )
    q.awaitTermination(120)

    def contents(path):
        return sorted(
            (r.vec_id, tuple(round(x, 6) for x in r.embedding), r.centroid_id)
            for r in spark.read.parquet(path).collect()
        )

    assert contents(idx_b.path) == contents(idx_a.path)
    # a NEW logged batch continues the monotone numbering past the
    # truncation (high-water batch kept => _next_batch_seq unaffected)
    b4 = spark.createDataFrame(
        [(101, [1.0, 0.0, 0.0, 0.9])], "vec_id long, embedding array<float>"
    )
    incremental_upsert(spark, idx_a, b4, log_path=log)
    assert spark.read.parquet(log).agg({"batch_seq": "max"}).first()[0] == 3
