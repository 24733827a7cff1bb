"""Composed streaming crawl -> corpus -> index path (r5 verdict ask #7).

The pieces each have their own tests (stream_read_wet in test_warc.py,
quality_gate batch≡stream in test_streaming_multimodal.py,
stream_index_sync in test_index_sync.py); this file runs them as ONE
continuous pipeline — WET shards land in a directory, the streaming
reader decodes them, the Gopher quality gate filters in-stream, and the
survivors are embedded and appended to a centroid-partitioned IVF index
— and asserts the final index state equals the batch twin of the same
stages (same decode, same gate, same embed/assign expressions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.functions.embedding import (
    embed_text,
    hashing_embedding,
)
from vector_search_databricks_poc_spark.operators.index import (
    assign_centroid,
    build_ivf_index,
)
from vector_search_databricks_poc_spark.operators.text import quality_gate
from vector_search_databricks_poc_spark.sources.warc import (
    read_wet,
    stream_read_wet,
    write_wet,
)
from vector_search_databricks_poc_spark.streaming.index_sync import (
    stream_index_sync,
)

DIM = 32


def test_streaming_crawl_to_index_equals_batch(spark, tmp_path):
    # --- land WET shards: 100 clean docs + planted degenerate ones the
    # gate must drop (looping paragraphs -> dup_para_frac over threshold)
    docs = (
        load_table(spark, SF_DIR, "documents")
        .where(F.col("doc_id") < 100)
        .select(
            F.concat(F.lit("http://crawl.example/"), F.col("doc_id")).alias("url"),
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(
                    F.col("text"),
                    F.lit("\n\nbuy now limited offer" * 1),
                    F.lit("\n\nbuy now limited offer\n\nbuy now limited offer"),
                    F.lit("\n\nbuy now limited offer\n\nbuy now limited offer"),
                ),
            ).otherwise(F.col("text")).alias("text"),
        )
    )
    landing = str(tmp_path / "landing")
    write_wet(docs.repartition(3), landing).collect()

    # --- seed index: centroids fitted on a tiny bootstrap corpus (the
    # stream appends against FIXED centroids, the delta-sync contract)
    seed = (
        load_table(spark, SF_DIR, "documents")
        .where((F.col("doc_id") >= 100) & (F.col("doc_id") < 120))
        .select("doc_id", "text")
    )
    emb_seed = embed_text(seed, dim=DIM).select(
        F.xxhash64(F.concat(F.lit("http://seed/"), F.col("doc_id"))).alias("vec_id"),
        "embedding",
    )
    idx = build_ivf_index(emb_seed, str(tmp_path / "idx"), k_centroids=4)
    seed_ids = {r["vec_id"] for r in spark.read.parquet(idx.path).select("vec_id").collect()}

    # --- the streaming pipeline: decode -> gate -> keep -> id -> sync
    stream = stream_read_wet(spark, landing)
    gated = quality_gate(stream).where(F.col("keep")).select(
        F.xxhash64("url").alias("vec_id"), "text"
    )
    q = stream_index_sync(
        gated, idx, id_col="vec_id", dim=DIM,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(180)

    # --- batch twin of the same stages, using the same expressions
    batch_gated = (
        quality_gate(read_wet(spark, landing))
        .where(F.col("keep"))
        .select(F.xxhash64("url").alias("vec_id"), "text")
    )
    expected = assign_centroid(
        batch_gated.where(F.col("text").isNotNull()).select(
            "vec_id",
            hashing_embedding("text", dim=DIM).cast("array<float>").alias("embedding"),
        ),
        idx.centroids,
    ).select("vec_id", "centroid_id")
    exp = {(r["vec_id"], r["centroid_id"]) for r in expected.collect()}

    # the gate actually dropped the planted degenerate docs
    n_landed = read_wet(spark, landing).count()
    assert n_landed == 100
    assert 0 < len(exp) < n_landed

    got = {
        (r["vec_id"], r["centroid_id"])
        for r in spark.read.parquet(idx.path)
        .select("vec_id", "centroid_id")
        .collect()
        if r["vec_id"] not in seed_ids
    }
    assert got == exp

    # a gated-in streamed doc is findable through the index probe
    some_id, _ = next(iter(exp))
    row = (
        spark.read.parquet(idx.path).where(F.col("vec_id") == some_id).first()
    )
    hits = idx.search(spark, [float(x) for x in row["embedding"]], k=1, nprobe=4).collect()
    assert hits and hits[0]["vec_id"] == some_id


def test_streaming_crawl_to_graph_equals_batch(spark, tmp_path):
    """r6 verdict ask #7: the full continuous composition
    stream_read_wet -> quality_gate -> stream_near_dup_gate ->
    stream_graph_sync, run over TWO landing waves with persistent
    checkpoints — and the final graph-ANN state must equal the batch
    twin (same seed build + one insert_into_graph per wave of the same
    accepted survivors).  Each stage's pairwise equivalence is tested
    elsewhere; this asserts the composition end to end."""
    from vector_search_databricks_poc_spark.operators.graph_ann import (
        build_graph_index,
        insert_into_graph,
    )
    from vector_search_databricks_poc_spark.streaming.dedup_gate import (
        stream_near_dup_gate,
    )
    from vector_search_databricks_poc_spark.streaming.index_sync import (
        stream_graph_sync,
    )

    fixture = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    degen = "\n\nbuy now limited offer" * 5

    def wave(base_id, lo, hi, dup_of=None):
        """Fixture docs re-idd to base_id+doc_id; doc base_id+lo+1 is a
        planted near-dup of base_id+lo (gate must drop the larger id);
        doc base_id+lo+5 is degenerate (quality gate must drop);
        dup_of (text) plants a CROSS-wave near-dup on base_id+lo+2."""
        d = fixture.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        w = d.select(
            (F.col("doc_id") + base_id).alias("doc_id"), "text"
        ).collect()
        rows = {r["doc_id"]: r["text"] for r in w}
        first = base_id + lo
        rows[first + 1] = rows[first].replace(rows[first].split()[0], "XQZV", 1)
        rows[first + 5] = rows[first + 5] + degen
        if dup_of is not None:
            rows[first + 2] = dup_of.replace(dup_of.split()[-1], "QVXZ", 1)
        return [
            (f"http://crawl.example/{i}", t) for i, t in sorted(rows.items())
        ], rows[first]

    wave1, w1_base = wave(10_000, 0, 40)
    wave2, _ = wave(20_000, 40, 70, dup_of=w1_base)

    landing = str(tmp_path / "landing")
    acc, store = str(tmp_path / "accepted"), str(tmp_path / "store")
    chk_gate, chk_graph = str(tmp_path / "chk_gate"), str(tmp_path / "chk_graph")

    # seed graph (fixture ids << streamed ids, the insert watermark contract)
    seed = embed_text(
        fixture.where(F.col("doc_id") >= 480).select("doc_id", "text"), dim=DIM
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    idx_stream = build_graph_index(
        seed, str(tmp_path / "g_stream"), deg=4, k_centroids=4, refine_rounds=0
    )
    idx_batch = build_graph_index(
        seed, str(tmp_path / "g_batch"), deg=4, k_centroids=4, refine_rounds=0
    )

    def run_wave(n, rows):
        # each wave lands in its own subdir (write_wet shard names derive
        # from partition ids and would collide across calls); the stream
        # reads the glob so new waves are new files to the checkpoint
        write_wet(
            spark.createDataFrame(rows, ["url", "text"]).coalesce(1),
            f"{landing}/wave{n}",
        ).collect()
        # stage 1+2: WET decode -> quality gate -> near-dup gate
        gated = quality_gate(stream_read_wet(spark, f"{landing}/*")).where(
            F.col("keep")
        ).select(
            F.regexp_extract("url", r"(\d+)$", 1).cast("long").alias("doc_id"),
            "text",
        )
        q1 = stream_near_dup_gate(
            gated, acc, store, checkpoint_dir=chk_gate, threshold=0.5
        )
        assert q1.awaitTermination(180)
        # stage 3: accepted corpus -> graph index
        accepted = spark.readStream.schema(
            spark.read.parquet(acc).schema
        ).parquet(acc)
        q2 = stream_graph_sync(
            accepted, idx_stream, id_col="doc_id", dim=DIM,
            checkpoint_dir=chk_graph,
        )
        assert q2.awaitTermination(180)

    run_wave(1, wave1)
    run_wave(2, wave2)

    # gate semantics actually bit: planted drops out, base docs in
    acc_ids = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    assert 10_000 in acc_ids and 10_001 not in acc_ids  # in-batch near-dup
    assert 10_005 not in acc_ids                        # quality-gated
    assert 20_042 not in acc_ids                        # cross-wave near-dup
    assert acc_ids and all(i >= 10_000 for i in acc_ids)

    # batch twin: one insert per wave of the SAME accepted survivors
    acc_df = spark.read.parquet(acc)
    for lo, hi in ((10_000, 20_000), (20_000, 30_000)):
        batch = acc_df.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).select(
            F.col("doc_id").alias("vec_id"),
            hashing_embedding("text", dim=DIM).cast("array<float>").alias(
                "embedding"
            ),
        )
        insert_into_graph(spark, idx_batch, batch)

    rows = lambda p: sorted(  # noqa: E731
        (r["vec_id"], r["centroid_id"], tuple(r["neighbors"]))
        for r in spark.read.parquet(p).collect()
    )
    assert rows(idx_stream.path) == rows(idx_batch.path)
    assert idx_stream.entries == idx_batch.entries

    # a gated-in survivor is findable through the streamed graph
    some = acc_df.where(F.col("doc_id") == 10_000).first()
    qv = [
        float(x)
        for x in embed_text(
            spark.createDataFrame([(0, some["text"])], "doc_id long, text string"),
            dim=DIM,
        ).first()["embedding"]
    ]
    hits = idx_stream.search(spark, qv, k=3, ef=16, nprobe=4).collect()
    assert hits and hits[0]["vec_id"] == 10_000
