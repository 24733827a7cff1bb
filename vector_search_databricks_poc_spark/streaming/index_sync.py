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

from .. import vectors as V
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

    embedded = doc_stream.select(
        F.col(id_col).alias(index.id_col),
        hashing_embedding(text_col, dim=dim).alias("_raw"),
    ).select(
        index.id_col,
        V.l2_normalize("_raw").cast("array<float>").alias(index.vec_col),
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        assigned = assign_centroid(batch_df, index.centroids, vec_col=index.vec_col)
        assigned.write.mode("append").partitionBy("centroid_id").parquet(index.path)

    writer = embedded.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
