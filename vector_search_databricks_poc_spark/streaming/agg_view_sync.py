"""Streaming materialized-aggregate maintenance (B20 + matview composition).

The batch half (operators/matview.py) refreshes a groupBy state from one
snapshot diff; this module keeps the view CONTINUOUSLY current against
the engine's self-written change feed (incremental_upsert's `_changes`
parquet — the same log stream_change_log_sync replays into indexes).

The change log carries (id, op, batch_seq) but no pre-images, and delta
refresh must SUBTRACT the old contribution of every updated/deleted row.
So the view owns a *contribution store*: a narrow projection of the base
(id, group keys, measure sources) hash-bucketed by id.  Per micro-batch:

1. collapse the batch to the latest op per id;
2. pre-images  = contribution store ∩ changed ids (bucket-pruned read);
3. post-images = base table ∩ upserted ids (semi-join-pruned);
4. the view state steps through ``incremental_agg_refresh`` with the
   contribution store as the old/new snapshot pair — so BOTH modes work
   (delta for sum/count; recount_groups when min/max are maintained);
5. the state swaps whole (it is n_groups rows) carrying the applied
   batch id; the store rewrites ONLY the touched id-buckets via dynamic
   partition overwrite.

Replay safety: the state swap is guarded by the recorded batch id (a
replayed micro-batch skips the arithmetic instead of double-applying),
and the store rewrite is idempotent (bucket content = old-minus-changed
∪ post-images — same result on re-run), so a crash between the two
swaps converges on replay.

At 100 TB: every read in the loop is churn-sized (semi joins broadcast
the batch's ids; the store read prunes to touched buckets), the store is
a slim keys+measures projection, and the state is group-cardinality
rows.  The view never rescans the base table.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.matview import group_agg, incremental_agg_refresh

_N_BUCKETS = 64
_STATE = "state"
_CONTRIB = "contrib"
_META = "_view_meta"


def _src_cols(measures: dict) -> list[str]:
    out: list[str] = []
    for _, (fn, src) in measures.items():
        if fn != "count" and src not in out:
            out.append(src)
    return out


def _bucket(id_col: str):
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(_N_BUCKETS)).cast("int")


def _paths(view_dir: str) -> tuple[str, str]:
    base = view_dir.rstrip("/")
    return f"{base}/{_STATE}", f"{base}/{_CONTRIB}"


def _write_marker(spark: SparkSession, state_dir: str, batch_id: int) -> None:
    """The applied-batch marker lives inside the state dir (underscore
    prefix => invisible to the parquet reader), so the swap rename moves
    marker and state together.  Written driver-side via the Hadoop FS
    API: the previous ``df.write.text`` launched a Spark write job that
    cost a measured 5-8 s per marker on Spark 4.1 local — two markers per
    maintained batch made metadata the single largest cost of the whole
    streaming view (guide §5: tiny metadata is not cluster work)."""
    from ..catalog import write_text_file

    write_text_file(
        spark, f"{state_dir}/{_META}", json.dumps({"applied_batch": batch_id})
    )


def init_agg_view(
    spark: SparkSession,
    view_dir: str,
    base: DataFrame,
    keys: list[str],
    measures: dict,
    id_col: str,
    null_counts: bool = False,
) -> None:
    """Bootstrap the view from the current base table: write the
    aggregate state and the bucketed contribution store (the one full
    scan the view ever pays).

    ``null_counts=True`` bootstraps the state with per-sum non-null
    counts (group_agg's NULL-correct shape, ADVICE r7): the refresh
    auto-detects the ``__nn`` columns, so a view over nullable measure
    sources keeps SQL NULL semantics through every stream batch."""
    state_path, contrib_path = _paths(view_dir)
    contrib = base.select(id_col, *keys, *_src_cols(measures)).withColumn(
        "_bucket", _bucket(id_col)
    )
    # repartition by the bucket key before the partitioned write: without
    # it every scan task writes a file into every bucket directory
    # (tasks x buckets small files, written SERIALLY per task — measured
    # 2x slower even at fixture scale); with it each bucket is one file
    # and the 64 writers run in parallel (guide §6 small-files)
    contrib.repartition(_N_BUCKETS, "_bucket").write.mode("overwrite").partitionBy(
        "_bucket"
    ).parquet(contrib_path)
    group_agg(base, keys, measures, null_counts=null_counts).write.mode(
        "overwrite"
    ).parquet(state_path)
    _write_marker(spark, state_path, -1)


def read_agg_view(spark: SparkSession, view_dir: str) -> DataFrame:
    return spark.read.parquet(_paths(view_dir)[0])


def _applied_batch(spark: SparkSession, state_path: str) -> int:
    from ..catalog import read_text_file

    return int(
        json.loads(read_text_file(spark, f"{state_path}/{_META}"))["applied_batch"]
    )


def stream_agg_view_sync(
    base: DataFrame,
    view_dir: str,
    log_path: str,
    keys: list[str],
    measures: dict,
    id_col: str,
    mode: str = "delta",
    checkpoint_dir: str | None = None,
):
    """Start the sync; returns the StreamingQuery.

    ``base`` is the post-image table (current row per live id) — the same
    contract as ``stream_change_log_sync``.  ``log_path`` streams the
    self-written change feed.  The view must have been bootstrapped with
    ``init_agg_view`` (against the base as of the log's start).

    The applied-batch marker is scoped to ONE checkpoint lineage: batch
    ids restart at 0 under a fresh checkpoint, so a fresh-checkpoint
    replay of an already-drained log converges (tested), but switching
    checkpoints while NEW un-applied ops sit in the log would let the
    marker mask them — re-bootstrap with ``init_agg_view`` when changing
    checkpoints, the same re-sync rule any exactly-once sink has."""
    spark = base.sparkSession
    state_path, contrib_path = _paths(view_dir)
    id_type = base.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, op string, batch_seq long, ts timestamp"
    changes = spark.readStream.schema(schema).parquet(log_path)
    src_cols = _src_cols(measures)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        latest = batch_df.groupBy(id_col).agg(
            F.max_by("op", "batch_seq").alias("op")
        ).localCheckpoint()
        changed_ids = latest.select(id_col)
        # touched buckets, driver-side: prunes the store read AND names
        # the partitions the dynamic overwrite will rewrite (bounded by
        # the batch, <= _N_BUCKETS ints); doubles as the empty-batch
        # check (one job instead of a separate take(1))
        buckets = [
            r["_b"]
            for r in changed_ids.select(_bucket(id_col).alias("_b")).distinct().collect()
        ]
        if not buckets:
            return
        contrib_pre = spark.read.parquet(contrib_path).where(
            F.col("_bucket").isin(buckets)
        ).select(id_col, *keys, *src_cols)
        pre_images = contrib_pre.join(F.broadcast(changed_ids), id_col, "left_semi")
        upsert_ids = latest.where(F.col("op") != "delete").select(id_col)
        post_images = base.join(F.broadcast(upsert_ids), id_col, "left_semi").select(
            id_col, *keys, *src_cols
        )
        # delta mode reads only changed rows, so the restricted pre/post
        # images ARE the snapshot pair; recount mode recomputes whole
        # affected GROUPS, whose members live in arbitrary buckets — it
        # gets the full store view (lazily; the refresh prunes it to the
        # affected group keys itself)
        if mode == "delta":
            old_arg, new_arg = pre_images, post_images
        else:
            store_full = spark.read.parquet(contrib_path).select(
                id_col, *keys, *src_cols
            )
            old_arg = store_full
            new_arg = store_full.join(
                F.broadcast(changed_ids), id_col, "left_anti"
            ).unionByName(post_images)
        state = spark.read.parquet(state_path)
        if _applied_batch(spark, state_path) < batch_id:
            new_state = incremental_agg_refresh(
                state, old_arg, new_arg, changed_ids.localCheckpoint(),
                keys=keys, measures=measures, id_col=id_col, mode=mode,
            ).localCheckpoint()  # materialize BEFORE overwriting the input
            new_state.write.mode("overwrite").parquet(state_path + "_stage")
            _write_marker(spark, state_path + "_stage", batch_id)
            _swap(spark, state_path)
        # store rewrite: idempotent (old-minus-changed ∪ post-images), so
        # it may safely re-run on replay after a crash mid-sink
        bucket_content = (
            contrib_pre.join(F.broadcast(changed_ids), id_col, "left_anti")
            .unionByName(post_images)
            .withColumn("_bucket", _bucket(id_col))
            # one file per touched bucket, written in parallel — the
            # unrepartitioned rewrite emitted tasks x buckets fragments
            # PER BATCH, so the store's file count grew without bound
            .repartition(_N_BUCKETS, "_bucket")
            .localCheckpoint()  # materialize BEFORE overwriting the input
        )
        (
            bucket_content.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket")
            .parquet(contrib_path)
        )

    writer = changes.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def _swap(spark: SparkSession, path: str) -> None:
    """stage-aside swap (layout.compact_files protocol): at least one
    complete copy of the state exists at every step."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    src, dst, old = hpath(path + "_stage"), hpath(path), hpath(path + "_old")
    fs = dst.getFileSystem(hconf)
    if fs.exists(old):
        fs.delete(old, True)
    if not fs.rename(dst, old):
        raise IOError(f"agg_view swap: could not move {path} aside")
    if not fs.rename(src, dst):
        fs.rename(old, dst)
        raise IOError(f"agg_view swap: could not move staged state into {path}")
    fs.delete(old, True)
