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

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

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

    Guards: ``dim`` must match the index's centroid dimension (a mismatch
    would NULL every centroid assignment and dump the whole stream into
    the Hive default partition — "succeeding" while indexing nothing
    findable), and rows whose embedding comes back null (null text) are
    dropped like the batch paths drop invalid vectors.

    Replay safety: committed micro-batches never re-run (checkpointed
    foreachBatch), and the one batch that CAN replay after a crash is
    deduped via a tiny ``_stream_batches`` marker parquet written after
    each data append — the residual double-write window is a crash
    BETWEEN the data append and the marker append, stated here rather
    than papered over (a transactional sink like Delta closes even that).
    """
    cdim = len(index.centroids[0])
    if dim != cdim:
        raise ValueError(
            f"dim={dim} does not match the index's centroid dim {cdim}"
        )

    # drop null-text rows BEFORE embedding: hashing_embedding is NULL iff
    # its input is, and filtering on the embedded column would re-evaluate
    # the whole embedding expression in the predicate (no CSE)
    embedded = doc_stream.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias(index.id_col),
        hashing_embedding(text_col, dim=dim).cast("array<float>").alias(index.vec_col),
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _sync_batch(batch_df, batch_id, index)

    writer = embedded.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def _sync_batch(batch_df: DataFrame, batch_id: int, index: IvfIndex) -> None:
    """One micro-batch append with marker-based replay dedupe (module-level
    so the idempotency contract is testable without running a stream)."""
    from pyspark.errors import AnalysisException

    from ..operators.incremental import _is_missing_path

    spark = batch_df.sparkSession
    marker_path = index.path.rstrip("/") + "_stream_batches"
    try:
        done = {
            r[0] for r in spark.read.parquet(marker_path).select("batch_id").collect()
        }
    except AnalysisException as e:
        if not _is_missing_path(e):
            raise
        done = set()
    if batch_id in done:
        return  # replayed batch: data already appended
    assigned = assign_centroid(batch_df, index.centroids, vec_col=index.vec_col)
    assigned.write.mode("append").partitionBy("centroid_id").parquet(index.path)
    spark.createDataFrame([(int(batch_id),)], "batch_id long").write.mode(
        "append"
    ).parquet(marker_path)


def stream_graph_sync(
    doc_stream: DataFrame,
    index,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    checkpoint_dir: str | None = None,
):
    """Keep a graph-ANN index (`operators/graph_ann.py::GraphIndex`) fresh
    from a document stream: each micro-batch is embedded with the engine's
    deterministic hashing encoder, then inserted with the HNSW-style
    search-based batch insert inside ``foreachBatch`` — a batch's edges
    come from beam searches against the CURRENT graph, so later batches
    connect through earlier ones exactly like sequential HNSW insertion.

    Replay safety is strictly stronger than the IVF append path: besides
    the ``_stream_batches`` marker, ``insert_into_graph``'s own high
    watermark makes a fully-replayed batch a no-op even without the marker
    (ids at or below the stored max never re-enter).  The honest residual
    window is a crash INSIDE the insert's multi-partition rewrite: the
    dynamic partition overwrite is not atomic across partitions, so a
    mid-write crash can leave the new nodes present but some affected
    neighbors' re-prunes and the entry-point ``_meta`` refresh unapplied —
    searches stay correct-but-weaker (recall, not wrongness) until the
    next insert or a rebuild; the staged-dir swap used by
    ``rebalance_ivf_index`` would close even that.

    Returns the StreamingQuery.
    """
    cdim = len(index.centroids[0])
    if dim != cdim:
        raise ValueError(
            f"dim={dim} does not match the index's centroid dim {cdim}"
        )
    embedded = doc_stream.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias(index.id_col),
        hashing_embedding(text_col, dim=dim).cast("array<float>").alias(index.vec_col),
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _graph_sync_batch(batch_df, batch_id, index)

    writer = embedded.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def _graph_sync_batch(batch_df: DataFrame, batch_id: int, index) -> None:
    """One micro-batch graph insert with marker-based replay dedupe
    (module-level so the idempotency contract is testable without running
    a stream)."""
    from pyspark.errors import AnalysisException

    from ..operators.graph_ann import insert_into_graph
    from ..operators.incremental import _is_missing_path

    spark = batch_df.sparkSession
    marker_path = index.path.rstrip("/") + "_stream_batches"
    try:
        done = {
            r[0] for r in spark.read.parquet(marker_path).select("batch_id").collect()
        }
    except AnalysisException as e:
        if not _is_missing_path(e):
            raise
        done = set()
    if batch_id in done:
        return  # replayed batch: already inserted
    res = insert_into_graph(spark, index, batch_df)
    skipped = int(getattr(res, "skipped", 0))
    if skipped:
        # An update/re-embed of an existing id (or a bad vector) was
        # discarded by the insert's watermark/dim guard — surface it, the
        # batch is still marked consumed.
        _LOG.warning(
            "stream_graph_sync batch %s: inserted %d, skipped %d rows "
            "(at/below watermark, dim-guard, or in-batch dup)",
            batch_id, int(res), skipped,
        )
    spark.createDataFrame(
        [(int(batch_id), int(res), skipped)],
        "batch_id long, inserted long, skipped long",
    ).write.mode("append").parquet(marker_path)


def stream_graph_change_sync(
    index,
    source: DataFrame,
    log_path: str,
    checkpoint_dir: str | None = None,
    id_col: str | None = None,
    vec_col: str | None = None,
):
    """Replay a self-written change log into a GRAPH index — the graph
    twin of ``stream_change_log_sync`` (r7; needs
    ``operators/graph_ann.py::delete_from_graph`` / ``upsert_into_graph``).

    Same feed contract: ``log_path`` streams (id, op, batch_seq, ts)
    rows, ``source`` is the post-image vector table.  Each micro-batch
    collapses to the latest op per id; deletes apply first
    (``delete_from_graph`` — FreshDiskANN local repair), then surviving
    insert/update ids join back to ``source`` and apply one
    ``upsert_into_graph`` (delete-then-reinsert for updates, plain
    insert for new ids).  Exactly-once via the checkpointed foreachBatch;
    a crash between the upsert's halves converges on replay (see
    ``upsert_into_graph``).  Returns the StreamingQuery.
    """
    id_col = id_col or index.id_col
    vec_col = vec_col or index.vec_col
    spark = source.sparkSession
    id_type = source.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, op string, batch_seq long, ts timestamp"
    changes = spark.readStream.schema(schema).parquet(log_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.graph_ann import delete_from_graph, upsert_into_graph

        latest = batch_df.groupBy(id_col).agg(
            F.max_by("op", "batch_seq").alias("op")
        ).localCheckpoint()  # one pass over the batch, reused twice
        delete_ids = [
            r[0] for r in latest.where(F.col("op") == "delete").collect()
        ]
        if delete_ids:
            delete_from_graph(spark, index, delete_ids)
        upsert_ids = latest.where(F.col("op") != "delete").select(id_col)
        changed = source.join(upsert_ids, id_col, "left_semi").select(
            F.col(id_col).alias(index.id_col),
            F.col(vec_col).alias(index.vec_col),
        )
        stats = upsert_into_graph(spark, index, changed)
        if stats["skipped"]:
            _LOG.warning(
                "stream_graph_change_sync batch %s: %d change rows "
                "skipped (dim-guard or duplicate)", batch_id, stats["skipped"],
            )

    writer = changes.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_change_log_sync(
    index: IvfIndex,
    source: DataFrame,
    log_path: str,
    checkpoint_dir: str | None = None,
    id_col: str | None = None,
    vec_col: str | None = None,
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

    id_col = id_col or index.id_col
    vec_col = vec_col or index.vec_col
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
