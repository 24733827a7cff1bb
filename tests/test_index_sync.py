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
