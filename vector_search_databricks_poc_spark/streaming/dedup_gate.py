"""Streaming near-duplicate gate (B10 + B20 composition).

Continuous crawl ingest needs near-dup removal against EVERYTHING
accepted so far, not just inside one micro-batch (streaming/windows.py's
``streaming_dedup`` is exact-key only).  The reference has no streaming
path at all (its sync is a managed delta-sync trigger,
syntetic_data.py:69-107); this is the engine's continuous-corpus
rendition.

Shape: ``foreachBatch`` reuses the BATCH incremental operator
(operators/dedup.py::incremental_minhash_near_dup), so stream and batch
near-dup semantics are identical by construction — the same hash family,
banding, and exact-Jaccard verify.  Two artifacts grow as survivors are
admitted:

- ``accepted_path``: the deduped corpus (parquet appends);
- ``store_path``: its LSH signature store (band rows, a few dozen bytes
  per doc) — future batches probe THIS, never re-reading or re-hashing
  the accepted text (historical text is touched only for the candidate
  ids during exact verify, broadcast-semi-join pruned).

100 TB shape: per micro-batch the store streams past the broadcast
batch band rows (no store shuffle, no driver materialization); cost per
batch is O(batch + matching store rows), independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_near_dup_gate(
    docs_stream: DataFrame,
    accepted_path: str,
    store_path: str,
    checkpoint_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
):
    """Start the gate: returns the StreamingQuery (availableNow trigger —
    rerun to drain newly-landed input, state carries over via the two
    artifact paths).

    Contract: ids must be globally unique across the whole stream (the
    signature store keys on them); each micro-batch drops docs
    near-duplicate (``jaccard >= threshold``) to the accepted corpus OR
    to a smaller-id doc in the same batch, appends the survivors to
    ``accepted_path``, and extends the signature store.

    Replay safety: same marker recipe as stream_index_sync — committed
    batches never re-run (checkpoint), and the one batch that CAN replay
    after a crash is skipped via a ``_stream_batches`` marker parquet
    written after both data appends; the residual window is a crash
    between the appends and the marker, stated rather than papered over.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _gate_batch(
            batch_df, batch_id, accepted_path, store_path,
            id_col=id_col, text_col=text_col, threshold=threshold,
            n=n, num_hashes=num_hashes, bands=bands, portable=portable,
        )

    writer = docs_stream.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def _gate_batch(
    batch_df: DataFrame,
    batch_id: int,
    accepted_path: str,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
) -> None:
    """One micro-batch of the gate (module-level so batch semantics and
    the idempotency contract are testable without running a stream)."""
    from ..operators.dedup import (
        incremental_minhash_near_dup,
        minhash_near_dup_pairs,
        write_signature_store,
    )

    spark = batch_df.sparkSession
    marker_path = accepted_path.rstrip("/") + "_stream_batches"

    # Hadoop-FS existence probe instead of read + catch AnalysisException:
    # the first batch legitimately finds no artifacts, and the catch-based
    # probe would log a full (handled) stack trace per missing path
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()

    def _read_or_none(path: str):
        p = jvm.org.apache.hadoop.fs.Path(path)
        if not p.getFileSystem(hconf).exists(p):
            return None
        return spark.read.parquet(path)

    markers = _read_or_none(marker_path)
    if markers is not None and markers.where(
        F.col("batch_id") == int(batch_id)
    ).limit(1).count() > 0:
        return  # replayed batch: data already appended

    # the micro-batch feeds the band computation AND the survivor
    # anti-join AND the shingle verify — cut it once
    batch_df = batch_df.localCheckpoint(eager=False)
    store = _read_or_none(store_path)
    historical = _read_or_none(accepted_path)
    if store is None or historical is None:
        # first batch: no corpus yet — within-batch one-shot dedup (the
        # incremental operator's documented empty-store equivalence)
        pairs = minhash_near_dup_pairs(
            batch_df, id_col, text_col, threshold, n, num_hashes, bands, portable
        )
        drop = pairs.select(F.col("id_b").alias(id_col))
    else:
        pairs = incremental_minhash_near_dup(
            batch_df, store, historical,
            id_col=id_col, text_col=text_col, threshold=threshold,
            n=n, num_hashes=num_hashes, bands=bands, portable=portable,
        )
        # matches an accepted doc -> the NEW doc (id_a) goes; matches a
        # smaller-id batch-mate -> the larger id (id_b) goes (greedy,
        # same policy as prepare_training_data's single-pass path)
        drop = (
            pairs.where(F.col("origin") == "new_old")
            .select(F.col("id_a").alias(id_col))
            .unionByName(
                pairs.where(F.col("origin") == "new_new")
                .select(F.col("id_b").alias(id_col))
            )
        )
    survivors = batch_df.join(
        F.broadcast(drop.distinct()), on=id_col, how="left_anti"
    ).localCheckpoint(eager=False)  # feeds two appends below
    survivors.write.mode("append").parquet(accepted_path)
    write_signature_store(
        survivors, store_path, id_col=id_col, text_col=text_col,
        n=n, num_hashes=num_hashes, bands=bands, portable=portable,
        mode="append",
    )
    spark.createDataFrame([(int(batch_id),)], "batch_id long").write.mode(
        "append"
    ).parquet(marker_path)
