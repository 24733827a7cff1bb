"""Streaming index synchronization (B20 + B21 composition).

The reference's index stays fresh through a TRIGGERED delta-sync pipeline —
a managed service watches the Delta change feed and re-indexes changed rows
(syntetic_data.py:69-107).  The Structured-Streaming rendition: a document
stream is embedded, normalized, centroid-assigned against the EXISTING
index's centroids (no refit — same contract as delta-sync), and appended to
the centroid-partitioned index table inside ``foreachBatch``; each
micro-batch only touches the partitions its rows land in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.embedding import hashing_embedding
from ..operators.index import IvfIndex, assign_centroid


def stream_index_sync(
    doc_stream: DataFrame,
    index: IvfIndex,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    checkpoint_dir: str | None = None,
):
    """Start the sync: returns the StreamingQuery.

    ``doc_stream`` is any streaming DataFrame with (id, text).  Embedding
    uses the engine's deterministic hashing encoder here; swap
    ``hashing_embedding`` for the transformer pandas_udf in model serving.
    Exactly-once via the checkpointed foreachBatch sink (batch id dedupe is
    the caller's concern if the sink is replayed into a non-idempotent
    store; parquet append + batch id logging is the simple default).
    """

    # hashing_embedding L2-normalizes by default — no second normalize fold
    embedded = doc_stream.select(
        F.col(id_col).alias(index.id_col),
        hashing_embedding(text_col, dim=dim).cast("array<float>").alias(index.vec_col),
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        assigned = assign_centroid(batch_df, index.centroids, vec_col=index.vec_col)
        assigned.write.mode("append").partitionBy("centroid_id").parquet(index.path)

    writer = embedded.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_change_log_sync(
    index: IvfIndex,
    source: DataFrame,
    log_path: str,
    checkpoint_dir: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Replay a self-written change log (``incremental_upsert(...,
    log_path=...)``) into an index — the engine's rendition of the
    reference's CDF-triggered delta-sync (syntetic_data.py:69-78), with
    the change FEED itself owned by the engine instead of delta-spark.

    ``log_path`` streams as a file source of (id, op, batch_seq, ts)
    rows; ``source`` is the post-image table (current row per live id).
    Each micro-batch collapses to the LATEST op per id (``max_by`` over
    batch_seq — several appended log batches can land in one micro-batch),
    joins surviving insert/update ids back to ``source`` for their
    vectors, and applies one ``incremental_upsert`` — so replaying the
    whole log reaches the exact index state the batch path produced
    (asserted in tests/test_index_sync.py).  Exactly-once via the
    checkpointed foreachBatch; the replay writes no log of its own.

    Returns the StreamingQuery.
    """
    from ..operators.incremental import incremental_upsert

    spark = source.sparkSession
    # the log's id column has whatever type the source id has (string doc
    # ids are legal) — hardcoding 'long' would break the parquet read for
    # any non-int64 key
    id_type = source.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, op string, batch_seq long, ts timestamp"
    changes = spark.readStream.schema(schema).parquet(log_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        latest = batch_df.groupBy(id_col).agg(
            F.max_by("op", "batch_seq").alias("op")
        )
        latest = latest.localCheckpoint()  # one pass over the batch, reused twice
        upsert_ids = latest.where(F.col("op") != "delete").select(id_col)
        changed = source.join(upsert_ids, id_col, "left_semi").select(
            id_col, vec_col
        )
        delete_ids = latest.where(F.col("op") == "delete").select(id_col)
        incremental_upsert(
            spark, index, changed, id_col=id_col, vec_col=vec_col,
            deleted=delete_ids,
        )

    writer = changes.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
