"""Incremental index maintenance (SURVEY.md A6/B21).

The reference gets incrementality from Delta Change Data Feed + a TRIGGERED
delta-sync pipeline (syntetic_data.py:69-78,101): only changed rows re-embed
and re-index.  Without a managed service, the same contract is a
high-watermark batch job:

    new_rows = source WHERE id > last_indexed_id      (append-only corpora)
             | source WHERE ts > last_sync_ts         (timestamped corpora)

New rows are embedded, normalized, centroid-assigned with the EXISTING
centroids (no refit — same contract as delta-sync, which never rebuilds the
ANN structure on sync), and appended via dynamic partition overwrite so only
touched centroid partitions rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import vectors as V
from .index import IvfIndex, assign_centroid


def _is_missing_path(exc) -> bool:
    """True ONLY for the missing-table error condition.  Anything else an
    AnalysisException can carry (unresolved column from schema drift, a
    corrupt footer, permissions) must propagate — swallowing it would
    silently reset a watermark or batch sequence."""
    cond = None
    for attr in ("getCondition", "getErrorClass"):  # 4.x name, then legacy
        fn = getattr(exc, attr, None)
        if callable(fn):
            try:
                cond = fn()
            except Exception:
                cond = None
            if cond:
                break
    if cond:
        return cond.startswith("PATH_NOT_FOUND")
    return "PATH_NOT_FOUND" in str(exc)


def high_watermark(spark: SparkSession, index_path: str, id_col: str = "vec_id"):
    """Current max indexed id (one aggregate over index metadata columns;
    at scale, store this in a manifest instead of scanning).

    Only a missing table reads as "no watermark" — a corrupt or
    unreadable index must propagate, not silently restart the sync from
    scratch (which would re-append every source row as 'new')."""
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.parquet(index_path).agg(F.max(id_col)).first()
        return row[0]
    except AnalysisException as e:
        if _is_missing_path(e):
            return None  # first sync, nothing indexed yet
        raise


def _index_payload_cols(
    spark: SparkSession, index_path: str, id_col: str, vec_col: str
) -> list[str]:
    """Extra payload columns the index table carries beyond (id, vector,
    centroid_id) — ``build_ivf_index(..., extra_cols=...)``.  Incremental
    writes must keep carrying them or a partition rewrite would strip the
    payload from every surviving row."""
    from pyspark.errors import AnalysisException

    try:
        cols = spark.read.parquet(index_path).columns
    except AnalysisException as e:
        if _is_missing_path(e):
            return []
        raise
    return [c for c in cols if c not in (id_col, vec_col, "centroid_id")]


def _valid_vectors(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """The same guard build_ivf_index applies at build time: a NULL or
    wrong-dimension vector would assign a NULL centroid_id and land in the
    Hive default partition — present in the table yet invisible to every
    partition-pruned probe, and poisonous to emptied-partition cleanup."""
    return df.where(V.vec_dim_ok(vec_col, dim))


def incremental_refresh(
    spark: SparkSession,
    index: IvfIndex,
    source: DataFrame,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> int:
    """Append rows with id beyond the watermark into the index table.

    Returns the number of newly indexed rows.  Uses dynamic partition
    overwrite semantics on append so only the touched centroid partitions
    change (the batch analog of CDF's changed-rows-only sync).

    ``id_col``/``vec_col`` default to the INDEX's own columns — passing
    mismatched names was a silent foot-gun (wrong-column watermark probe +
    mixed-schema appends).  Null / wrong-dimension vectors are skipped,
    matching the build-time guard.  Payload columns the index carries
    (``extra_cols`` at build) are carried through and must be present in
    ``source``.
    """
    id_col = id_col or index.id_col
    vec_col = vec_col or index.vec_col
    payload = _index_payload_cols(spark, index.path, id_col, vec_col)
    missing = [c for c in payload if c not in source.columns]
    if missing:
        raise ValueError(
            f"index carries payload columns {missing} that source lacks"
        )
    wm = high_watermark(spark, index.path, id_col)
    fresh = source if wm is None else source.where(F.col(id_col) > wm)
    fresh = _valid_vectors(fresh, vec_col, len(index.centroids[0])).select(
        F.col(id_col),
        V.l2_normalize(vec_col).cast("array<float>").alias(vec_col),
        *payload,
    )
    # one execution for both the count and the write (uncached, the full
    # scan-normalize-assign pipeline would run twice)
    assigned = assign_centroid(
        fresh, index.centroids, vec_col=vec_col
    ).localCheckpoint()
    n = assigned.count()
    if n:
        assigned.write.mode("append").partitionBy("centroid_id").parquet(index.path)
    return n


def changes_path(index_path: str) -> str:
    """Default change-log location: a ``_changes`` parquet directory next
    to the index table."""
    return index_path.rstrip("/") + "_changes"


def _next_batch_seq(spark: SparkSession, log_path: str) -> int:
    """Next monotone batch sequence for the change log (one tiny aggregate
    over the log itself; at scale this lives in the sync manifest).

    Only a missing log maps to seq 0.  Any other read failure (corrupt
    file from an interrupted append, permissions) must propagate: writing
    a duplicate batch_seq=0 would make ``max_by(op, batch_seq)`` replay
    ordering nondeterministic — e.g. a delete could resurrect.

    Existence is probed through the Hadoop FileSystem API rather than by
    catching the reader's AnalysisException — the analyzer logs that
    exception at ERROR with a full stack trace before we could swallow
    it, which reads as a failure in any log a human (or driver) scans."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(log_path)
    if not hpath.getFileSystem(hconf).exists(hpath):
        return 0  # log doesn't exist yet
    row = spark.read.parquet(log_path).agg(F.max("batch_seq")).first()
    return (row[0] if row[0] is not None else -1) + 1


def incremental_upsert(
    spark: SparkSession,
    index: IvfIndex,
    changed: DataFrame,
    id_col: str | None = None,
    vec_col: str | None = None,
    deleted: DataFrame | None = None,
    log_path: str | None = None,
) -> int:
    """Propagate UPDATES, inserts, and DELETES into the index — the parquet
    analog of Delta Change Data Feed sync (reference syntetic_data.py:69-78):
    ``changed`` holds the post-image rows of a CDF batch; each replaces its
    old index entry, wherever that entry lives.  ``deleted`` (optional)
    holds the ids of delete-tombstone rows; their entries disappear.

    Only touched centroid partitions rewrite (dynamic partition overwrite):
    a partition is touched if it holds a changed/deleted row's OLD entry
    (the row may move centroids when its vector changed) or receives a NEW
    one.  Within a touched partition, survivors = old rows not in the
    changed/deleted-id set; the partition is rewritten as survivors + fresh
    assignments.  Partition count bounds the rewrite — untouched partitions
    keep their files, so cost scales with the change set, not the corpus.

    A touched partition can end up EMPTY (every old row updated away or
    deleted, nothing new assigned there).  Dynamic partition overwrite
    never rewrites a partition absent from the output, so those directories
    are deleted explicitly afterwards — otherwise the stale entries would
    survive and an updated id would be findable twice.

    ``log_path`` (optional) appends this batch to a self-written CHANGE
    LOG — a ``_changes`` parquet of (id, op ∈ insert/update/delete,
    batch_seq, ts).  This closes the Delta-CDF gap without delta-spark
    (reference contract syntetic_data.py:69-78): downstream consumers
    (``streaming.index_sync.stream_change_log_sync``) replay the log to
    reach the exact same index state as the batch path, so the change-feed
    MECHANISM, not just its semantics, exists here.  Ops are classified
    against the pre-image (id present → update, absent → insert; an id
    both changed and deleted in one batch logs as update — the new row
    wins in the index, see survivors/assigned below) and the log row is
    written only after the index write succeeds.

    Returns the number of upserted rows (deletes not counted).
    """
    id_col = id_col or index.id_col
    vec_col = vec_col or index.vec_col
    payload = _index_payload_cols(spark, index.path, id_col, vec_col)
    missing = [c for c in payload if c not in changed.columns]
    if missing:
        raise ValueError(
            f"index carries payload columns {missing} that changed lacks"
        )
    # build-time guard mirrored: a null/mis-sized vector would land in the
    # Hive default partition (invisible to pruned probes); its id keeps the
    # OLD index entry instead of silently corrupting the table
    fresh = _valid_vectors(changed, vec_col, len(index.centroids[0])).select(
        F.col(id_col),
        V.l2_normalize(vec_col).cast("array<float>").alias(vec_col),
        *payload,
    )
    # materialize assignments once: reused for touched-partition discovery
    # and the final write (and keeps the write independent of `changed`)
    assigned = assign_centroid(fresh, index.centroids, vec_col=vec_col).select(
        id_col, vec_col, *payload, "centroid_id"
    ).localCheckpoint()
    n = assigned.count()
    del_ids = deleted.select(id_col).distinct() if deleted is not None else None
    if not n and del_ids is None:
        return 0
    old = spark.read.parquet(index.path)
    ids = assigned.select(id_col)
    if del_ids is not None:
        ids = ids.unionByName(del_ids).distinct()
    touched = (
        old.join(ids, id_col, "left_semi")
        .select("centroid_id")
        .unionByName(assigned.select("centroid_id"))
        .distinct()
    )
    # materialize BEFORE the overwrite below invalidates the files this
    # plan reads; bounded by k_centroids, so driver-side set is tiny
    touched_parts = {r[0] for r in touched.collect()}
    log_rows = None
    if log_path is not None:
        # classify ops against the pre-image; checkpoint before the
        # overwrite invalidates `old`'s files
        old_ids = old.select(id_col)
        upd = assigned.select(id_col).join(old_ids, id_col, "left_semi")
        ins = assigned.select(id_col).join(old_ids, id_col, "left_anti")
        log_rows = upd.withColumn("op", F.lit("update")).unionByName(
            ins.withColumn("op", F.lit("insert"))
        )
        if del_ids is not None:
            real_del = (
                del_ids.join(old_ids, id_col, "left_semi")
                # an id both changed and deleted: the new row wins — log
                # it once, as the update/insert it actually was
                .join(assigned.select(id_col), id_col, "left_anti")
            )
            log_rows = log_rows.unionByName(
                real_del.withColumn("op", F.lit("delete"))
            )
        log_rows = log_rows.localCheckpoint()
    survivors = (
        old.join(F.broadcast(touched), "centroid_id", "left_semi")
        .join(ids, id_col, "left_anti")
        .select(id_col, vec_col, *payload, "centroid_id")
    )
    # eager checkpoint breaks lineage to index.path — required: the write
    # below overwrites partitions of the very table `survivors` reads
    out = survivors.unionByName(assigned).localCheckpoint()
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("centroid_id")
        .parquet(index.path)
    )
    written_parts = {r[0] for r in out.select("centroid_id").distinct().collect()}
    _delete_partition_dirs(spark, index.path, touched_parts - written_parts)
    if log_rows is not None:
        seq = _next_batch_seq(spark, log_path)
        (
            log_rows.select(
                id_col,
                "op",
                F.lit(seq).cast("long").alias("batch_seq"),
                F.current_timestamp().alias("ts"),
            )
            .write.mode("append")
            .parquet(log_path)
        )
    return n


def _delete_partition_dirs(spark: SparkSession, index_path: str, parts) -> None:
    """Remove emptied centroid partition directories through the Hadoop
    FileSystem API (works on any filesystem the cluster reaches, not just
    local disk)."""
    if not parts:
        return
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for p in sorted(parts):
        hpath = jvm.org.apache.hadoop.fs.Path(f"{index_path}/centroid_id={p}")
        hpath.getFileSystem(hconf).delete(hpath, True)


def index_file_counts(spark: SparkSession, index: IvfIndex) -> dict[int, int]:
    """centroid_id -> data-file count, via the Hadoop FileSystem API
    (bounded by k_centroids listings; underscore/dot entries — _meta,
    _SUCCESS, staging dirs — are ignored, matching Spark's file index)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(index.path)
    fs = root.getFileSystem(hconf)
    out: dict[int, int] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("centroid_id=")):
            continue
        cid = int(name.split("=", 1)[1])
        n = 0
        for f in fs.listStatus(st.getPath()):
            leaf = f.getPath().getName()
            if f.isFile() and not leaf.startswith(("_", ".")):
                n += 1
        out[cid] = n
    return out


def compact_index(
    spark: SparkSession,
    index: IvfIndex,
    max_files_per_partition: int = 8,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[int, int]:
    """Compact FRAGMENTED centroid partitions of an IVF index table.

    Every incremental batch (``incremental_refresh`` append,
    ``incremental_upsert`` partial rewrite, streaming sync micro-batch)
    adds files to the centroid partitions it touches; after thousands of
    syncs a probe of one partition opens thousands of footers and the
    scheduler pays per-file task overhead — the classic small-file decay
    of any incrementally-maintained table.  This walks the per-partition
    file counts (driver-side, bounded by k_centroids) and rewrites ONLY
    partitions above ``max_files_per_partition``, each through
    ``layout.compact_files``'s stage-and-swap on the PARTITION DIRECTORY
    — the partition value lives in the directory name, not the files, so
    compacting a subdirectory in place preserves the partition layout and
    partition pruning; untouched partitions keep their files byte-for-
    byte.  Centroids, ``_meta``, and search results are unaffected.

    Returns {centroid_id: files_written} for the partitions rewritten.
    """
    from .layout import compact_files

    done: dict[int, int] = {}
    for cid, n_files in sorted(index_file_counts(spark, index).items()):
        if n_files <= max_files_per_partition:
            continue
        done[cid] = compact_files(
            spark, f"{index.path}/centroid_id={cid}",
            target_file_bytes=target_file_bytes,
        )
    return done


def index_balance_report(spark: SparkSession, index: IvfIndex) -> DataFrame:
    """Per-centroid occupancy of an IVF index table — the monitoring view
    that says WHEN a rebalance is worth its full-rewrite cost.

    Incremental sync assigns new rows to the EXISTING centroids (the
    delta-sync contract, reference syntetic_data.py:69-78 — the service
    never refits the ANN structure on sync), so a corpus whose
    distribution drifts piles rows onto a few centroids: probes of those
    partitions scan far more than corpus_size/k rows and nprobe recall
    budgets silently skew.  One lazy plan: centroid range left-joined to
    the per-partition counts, so EMPTY centroids show as 0 rather than
    vanishing.  Columns: (centroid_id, n_rows, frac_rows).
    """
    k = len(index.centroids)
    cents = spark.range(k).select(F.col("id").cast("int").alias("centroid_id"))
    counts = (
        spark.read.parquet(index.path)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    tot = counts.agg(F.coalesce(F.sum("n_rows"), F.lit(0)).alias("_tot"))
    return (
        cents.join(counts, "centroid_id", "left")
        .na.fill({"n_rows": 0})
        .crossJoin(F.broadcast(tot))
        .select(
            "centroid_id",
            "n_rows",
            F.when(
                F.col("_tot") > 0, F.round(F.col("n_rows") / F.col("_tot"), 6)
            ).otherwise(F.lit(0.0)).alias("frac_rows"),
        )
        .orderBy("centroid_id")
    )


def index_imbalance(spark: SparkSession, index: IvfIndex) -> float:
    """max/mean of per-centroid row counts, EMPTY centroids included (a
    dead centroid is itself imbalance: its share of every probe budget is
    wasted).  1.0 = perfectly uniform; k = everything in one partition.
    Driver-side result is bounded by k_centroids rows."""
    counts = {
        r[0]: r[1]
        for r in spark.read.parquet(index.path).groupBy("centroid_id").count().collect()
    }
    k = len(index.centroids)
    full = [counts.get(i, 0) for i in range(k)]
    mean = sum(full) / k if k else 0
    return (max(full) / mean) if mean else 1.0


def rebalance_ivf_index(
    spark: SparkSession,
    index: IvfIndex,
    threshold: float = 2.0,
    k_centroids: int | None = None,
    sample_fraction: float = 1.0,
    seed: int = 42,
) -> tuple[IvfIndex, bool]:
    """Re-fit the coarse quantizer and rewrite the index table iff the
    partition imbalance exceeds ``threshold`` (max/mean row count, see
    :func:`index_imbalance`) — the missing end of the index lifecycle:
    build -> incremental sync (existing centroids) -> REBALANCE when drift
    has made those centroids a bad quantizer.

    Below threshold this is a no-op returning ``(index, False)`` — the
    report/threshold split means the expensive decision is explicit, never
    ambient.  Above it: KMeans re-fits on a (seeded) sample of the CURRENT
    stored vectors (already L2-normalized at build/sync time, so no second
    normalize pass), every row re-assigns, and the table rewrites via a
    STAGING directory + aside-rename swap (the ``layout.compact_files``
    protocol: at every step a complete copy of the index exists on disk)
    — one full pass over the data with no executor-storage pinning (a
    localCheckpoint of the whole corpus, the pattern the partial-rewrite
    paths use, does not scale to a full rebuild).  The swap is not
    transactional for concurrent readers — at
    100 TB run it like any table rebuild, behind the same scheduling fence
    as a schema migration; on object stores the rename is O(files) copies,
    so prefer a filesystem with atomic rename for big indexes.

    PQ indexes are refused: their codebooks are trained on RESIDUALS
    against the old centroids, so re-fitting centroids under an old
    codebook silently degrades ADC quality — rebuild from the float source
    with ``build_ivf_pq_index`` instead.

    Returns ``(new_index, True)`` / ``(index, False)``.
    """
    from .index import IvfPqIndex, _write_meta, fit_centroids

    if isinstance(index, IvfPqIndex):
        raise ValueError(
            "rebalance_ivf_index cannot rebalance an IVF-PQ index: the PQ "
            "codebook encodes residuals against the OLD centroids; rebuild "
            "from the float source with build_ivf_pq_index"
        )
    if index_imbalance(spark, index) <= threshold:
        return index, False

    cur = spark.read.parquet(index.path)
    data = cur.select(*[c for c in cur.columns if c != "centroid_id"])
    k = k_centroids or len(index.centroids)
    cents = fit_centroids(data, index.vec_col, k, seed, sample_fraction)
    assigned = assign_centroid(data, cents, vec_col=index.vec_col)

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    stage = index.path.rstrip("/") + "_rebuild_stage"
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(stage)
    # _meta goes into the STAGE directory before the swap: the staged copy
    # must be a complete, loadable index BEFORE the original is touched.
    # Writing it after the swap (and after deleting the old copy) left a
    # crash window where the old _meta was destroyed and the new one not
    # yet written — an index nothing could load again.
    _write_meta(
        spark, stage,
        {"kind": "ivf", "centroids": cents, "id_col": index.id_col,
         "vec_col": index.vec_col},
    )

    # layout.compact_files' swap protocol: move the original ASIDE before
    # moving the staged copy in, so every step leaves at least one
    # complete copy of the index on disk (delete-then-rename has a window
    # where a crash loses both)
    hpath = jvm.org.apache.hadoop.fs.Path
    src, dst, old = hpath(stage), hpath(index.path), hpath(index.path.rstrip("/") + "_rebuild_old")
    fs = dst.getFileSystem(hconf)
    if fs.exists(old):  # leftover from an interrupted previous rebalance
        fs.delete(old, True)
    if not fs.rename(dst, old):
        raise IOError(f"rebalance: could not move {index.path} aside")
    if not fs.rename(src, dst):
        fs.rename(old, dst)  # roll back: original back in place
        raise IOError(f"rebalance: could not move staged copy into {index.path}")
    fs.delete(old, True)
    return IvfIndex(index.path, cents, id_col=index.id_col, vec_col=index.vec_col), True


def truncate_change_log(
    spark: SparkSession, log_path: str, up_to_seq: int
) -> int:
    """Retention for the self-written change feed: drop log rows with
    ``batch_seq <= up_to_seq``.  Safe once every consumer's index state
    already includes those batches — the replay contract
    (``streaming/index_sync.py::stream_change_log_sync``) starts from a
    pre-image at least that fresh, and replaying the truncated log onto
    such a pre-image reaches the exact same state as replaying the full
    log onto the original (asserted in tests/test_index_sync.py).

    Refuses to drop the NEWEST batch: an emptied log would reset
    ``_next_batch_seq`` to 0 and re-issue already-used sequence numbers —
    ``max_by(op, batch_seq)`` replay ordering would then be ambiguous
    between old and new epochs.  Keeping at least the high-water batch
    preserves the monotone seq contract through any retention schedule.

    Rewrite is the staged-swap protocol (stage sibling + aside rename,
    same as ``layout.compact_files``): a complete log copy exists at
    every step.  Returns the number of rows dropped.
    """
    remaining = spark.read.parquet(log_path).where(
        F.col("batch_seq") > up_to_seq
    )
    all_rows = spark.read.parquet(log_path)
    max_seq_row = all_rows.agg(F.max("batch_seq")).first()
    max_seq = max_seq_row[0] if max_seq_row[0] is not None else -1
    if up_to_seq >= max_seq:
        raise ValueError(
            f"truncate_change_log: up_to_seq={up_to_seq} would drop the "
            f"newest batch (max batch_seq={max_seq}) and reset sequence "
            "numbering; keep at least the high-water batch"
        )
    n_total = all_rows.count()
    # stage the surviving rows, then swap (crash leaves a complete copy)
    stage = log_path.rstrip("/") + "_truncate_stage"
    old = log_path.rstrip("/") + "_truncate_old"
    remaining.localCheckpoint().write.mode("overwrite").parquet(stage)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    p, s, o = hpath(log_path), hpath(stage), hpath(old)
    fs = p.getFileSystem(hconf)
    if fs.exists(o):  # leftover from an interrupted previous truncate
        fs.delete(o, True)
    if not fs.rename(p, o):
        raise IOError(f"truncate_change_log: could not move {log_path} aside")
    if not fs.rename(s, p):
        fs.rename(o, p)  # roll back
        raise IOError(f"truncate_change_log: could not move staged copy in")
    fs.delete(o, True)
    return n_total - spark.read.parquet(log_path).count()
