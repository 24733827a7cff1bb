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
