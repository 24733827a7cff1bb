"""Data-layout management: z-order clustering, small-file compaction, and
key-skew diagnostics.

At 100 TB the dominant cost is the scan, and the scan is governed by
layout: multi-dimensional clustering (z-order) makes parquet row-group
min/max statistics selective on EVERY clustered column at once, compaction
keeps file counts (and thus task/scheduler overhead and footer reads)
bounded, and skew statistics tell you which join/agg keys need salting
before a job, not after it dies.  All computation here is deterministic
expression arithmetic — no RNG, no UDFs — so layouts are reproducible
across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _minmax_scaled(col: str, bits: int) -> tuple[Column, list[str]]:
    """Column scaled to an integer in [0, 2^bits): linear min/max
    normalization.  Returns the expression plus the names of the two
    aggregate inputs it expects joined in (``_min_<col>``, ``_max_<col>``)."""
    lo, hi = F.col(f"_min_{col}"), F.col(f"_max_{col}")
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (F.col(col).cast("double") - lo) / span
    scaled = F.least(
        F.floor(frac * F.lit(float(1 << bits))).cast("long"),
        F.lit((1 << bits) - 1).cast("long"),
    )
    return scaled, [f"_min_{col}", f"_max_{col}"]


def z_value(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Append ``_z``: the Morton (z-order) interleave of the given columns.

    Each column is min/max-scaled to ``bits`` bits (the min/max one-row
    aggregate re-enters the plan via a broadcast cross join — fully lazy),
    then bit i of column j lands at position ``i * len(cols) + j`` of the
    z-value.  Pure shift/mask arithmetic, whole-stage codegen; total bits
    must fit a long (``bits * len(cols) <= 62``).
    """
    if bits * len(cols) > 62:
        raise ValueError(f"bits*cols = {bits * len(cols)} exceeds long range")
    stats = df.agg(
        *[
            agg
            for c in cols
            for agg in (
                F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
            )
        ]
    )
    out = df.join(F.broadcast(stats))
    z = F.lit(0).cast("long")
    drop = []
    for j, c in enumerate(cols):
        scaled, helper_cols = _minmax_scaled(c, bits)
        out = out.withColumn(f"_s_{c}", scaled)
        drop += helper_cols + [f"_s_{c}"]
        for i in range(bits):
            bit = F.shiftright(F.col(f"_s_{c}"), i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return out.withColumn("_z", z).drop(*drop)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 32,
    compression: str = "zstd",
) -> None:
    """Write ``df`` clustered by the z-order of ``cols``: range-partition on
    the z-value (contiguous z-ranges per file — the property that makes
    row-group min/max stats tight on every clustered column), sort within
    partitions, drop the helper column.  The 100 TB OPTIMIZE ZORDER analog:
    a predicate on ANY of ``cols`` now skips most row groups, not just a
    predicate on the lead sort key."""
    z = z_value(df, cols, bits)
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(path)
    )


def _compact_scratch_paths(path: str) -> tuple[str, str]:
    """(stage, old) scratch-dir siblings for a compaction target.  A bare
    relative name stages in '.' — pre-r6 the empty rpartition parent made
    the scratch dirs '/.compact_stage__<name>' at the filesystem root
    (r5 ADVICE item)."""
    parent, sep, name = path.rstrip("/").rpartition("/")
    if not sep:
        parent = "."
    return f"{parent}/.compact_stage__{name}", f"{parent}/.compact_old__{name}"


def compact_files(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    compression: str = "zstd",
) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns the
    file count written.  Small-file proliferation (streaming sinks,
    per-batch appends) kills 100 TB scans — footer reads and task overhead
    scale with file count, not bytes.  Sizing uses the relation's plan
    statistics (no data job).

    Swap protocol (Hadoop FileSystem API, so it works on any filesystem
    Spark reaches, not just local disk): stage the compacted copy beside
    the target, rename the original aside, rename staged into place, then
    delete the old copy.  Directory rename is not atomic on object
    stores, but at EVERY step at least one complete copy of the data
    exists — a crash leaves the original (in place or aside) recoverable,
    never a window where the data is gone (the previous
    rmtree-then-rename had exactly that window).

    A persisted stats manifest (``_stats_manifest``) is rebuilt with its
    previous column coverage after the swap — compaction rewrites every
    data file, so the old manifest dies with the old directory and a
    full resweep is the true incremental cost.

    The scratch directories are DOT-prefixed siblings
    (``.compact_stage__<name>``, ``.compact_old__<name>``), so when
    ``path`` is one partition directory of a table (the compact_index
    case: ``.../centroid_id=5``), a crash or a concurrent reader of the
    PARENT table never sees a half-swapped partition as a phantom
    partition value (``centroid_id=5__compact`` would corrupt partition
    inference and double-count rows).  The prefix must be ``.``, not
    ``_``: Spark's file index keeps underscore-prefixed names that
    contain ``=`` (partition columns may start with ``_``), while
    dot-prefixed entries are always hidden.
    """
    import math

    # A stats manifest lives INSIDE the directory being swapped, so it
    # goes down with the old copy — remember its column coverage now and
    # rebuild after the swap (the whole table was rewritten, so a full
    # sweep IS the incremental cost here).
    manifest_cols = None
    if _manifest_dir_exists(spark, path):
        manifest_cols = sorted(
            {
                r.column
                for r in spark.read.parquet(
                    f"{path.rstrip('/')}/{MANIFEST_DIRNAME}"
                )
                .select("column")
                .distinct()
                .collect()
                if r.column is not None
            }
        )

    df = spark.read.parquet(path)
    size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n = max(1, math.ceil(int(size) / target_file_bytes))
    staged, old_path = _compact_scratch_paths(path)
    out = df.repartition(n)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").option("compression", compression).parquet(staged)

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    p, s, old = hpath(path), hpath(staged), hpath(old_path)
    fs = p.getFileSystem(hconf)
    if fs.exists(old):  # leftover from an interrupted previous swap
        fs.delete(old, True)
    if not fs.rename(p, old):
        raise IOError(f"compact_files: could not move {path} aside")
    if not fs.rename(s, p):
        fs.rename(old, p)  # roll back: original back in place
        raise IOError(f"compact_files: could not move staged copy into {path}")
    fs.delete(old, True)
    if manifest_cols is not None:
        write_manifest(spark, path, manifest_cols or None)
    return n


# ---------------------------------------------------------------------------
# File-level data skipping: a parquet-footer statistics manifest plus
# manifest-pruned reads.  Plain parquet directories get row-group skipping
# for free from pushed filters, but the executor still has to OPEN every
# file to read its footer — at 100 TB / 100k files that is 100k metadata
# round-trips per query before a byte of data moves.  Table formats solve
# this with a file-stats manifest consulted before planning (Iceberg
# manifests, Delta Add-file stats); this is that layer for raw parquet:
# one distributed footer sweep produces a tiny per-(file, column) min/max
# table, and pruned_read() drops whole files driver-side before
# spark.read ever sees them.  Composes with zorder_write(): clustering is
# what makes per-file min/max TIGHT, the manifest is what turns tight
# stats into skipped files.
#
# Timestamp caveat: Spark's default parquet timestamp encoding (INT96,
# spark.sql.parquet.outputTimestampType) carries NO column statistics, so
# timestamp columns in such files are honestly unprunable (has_stats =
# false, files kept).  Layouts meant for skipping on time should be
# written with outputTimestampType=TIMESTAMP_MICROS.
# ---------------------------------------------------------------------------

MANIFEST_DIRNAME = "_stats_manifest"  # '_'-prefixed: hidden from data scans

_MANIFEST_SCHEMA = (
    "file string, size_bytes long, n_rows long, column string, "
    "null_count long, has_stats boolean, "
    "min_num double, max_num double, min_str string, max_str string"
)


def _pa_fs_path(path: str):
    """(pyarrow filesystem | None, plain path) for a Spark/Hadoop URI.
    Hadoop renders local files as ``file:/x`` or ``file:///x``; pyarrow
    wants a bare path for those and a FileSystem handle for real schemes
    (s3://, hdfs://...)."""
    if path.startswith("file:"):
        rest = path[5:]
        while rest.startswith("//"):
            rest = rest[1:]
        return None, rest
    if "://" in path:
        from pyarrow import fs as pafs

        filesystem, rel = pafs.FileSystem.from_uri(path)
        return filesystem, rel
    return None, path


def _prunable_value(v, side: int):
    """(numeric, string) ordering key for one parquet stat or one user
    bound — exactly one is non-None; (None, None) means the type carries
    no sound ordering here.  ``side`` (-1 = lower end, +1 = upper end)
    pads lossy conversions OUTWARD one ulp, so file stats only ever widen
    and query bounds only ever widen: pruning stays sound, never exact-er
    than the data.

    Supported: bool/int/float/Decimal (→ double), datetime/date (→ epoch
    micros / days, tz-consistent because both the file stat and the user
    bound pass through THIS function), str (parquet string stats may be
    prefix-truncated, but the spec truncates min down and max up, which
    is exactly the widening direction).  bytes and everything else map to
    (None, None): the file stays unprunable on that column."""
    import datetime as _dt
    import math
    from decimal import Decimal

    if isinstance(v, bool):
        return float(v), None
    if isinstance(v, int):
        f = float(v)
        if abs(v) > (1 << 53) and int(f) != v:  # double rounded the int
            f = math.nextafter(f, -math.inf if side < 0 else math.inf)
        return f, None
    if isinstance(v, float):
        return (None, None) if v != v else (v, None)  # NaN poisons compares
    if isinstance(v, Decimal):
        f = float(v)  # may round either way: always pad outward
        return math.nextafter(f, -math.inf if side < 0 else math.inf), None
    if isinstance(v, _dt.datetime):
        epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        return (v - epoch) / _dt.timedelta(microseconds=1), None
    if isinstance(v, _dt.date):
        return float((v - _dt.date(1970, 1, 1)).days), None
    if isinstance(v, str):
        return None, v
    return None, None


def list_data_files(spark, path: str) -> list[tuple[str, int]]:
    """[(uri, size_bytes)] of every visible ``*.parquet`` data file under
    ``path``, recursively, via the Hadoop FileSystem API (works on any
    filesystem Spark reaches).  Hidden entries — any ``_``/``.``-prefixed
    path segment, so ``_stats_manifest`` itself, ``_SUCCESS`` markers and
    compaction scratch dirs — are skipped, matching what a Spark data scan
    would read."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    status = fs.getFileStatus(root)
    if status.isFile():  # a single-file "directory" (e.g. the fixture tables)
        return [(status.getPath().toString(), int(status.getLen()))]
    base = fs.makeQualified(root).toString().rstrip("/")
    out = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        uri = st.getPath().toString()
        rel = uri[len(base):].lstrip("/") if uri.startswith(base) else uri
        segs = rel.split("/")
        if any(s.startswith(("_", ".")) for s in segs):
            continue
        if segs[-1].endswith(".parquet"):
            out.append((uri, int(st.getLen())))
    return out


def file_stats_manifest(
    spark, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Per-(file, column) footer statistics for every parquet data file
    under ``path``: row/null counts and min/max as sortable numeric or
    string keys (see ``_prunable_value``).  One row per requested column
    per file; a column absent from a file's schema (schema evolution) or
    lacking sound stats still gets a row with ``has_stats = false``, so
    consumers always see every file.

    The sweep is DISTRIBUTED: the file list fans out over executors and
    each task reads only footers (``pyarrow.parquet.read_metadata``), so
    a 100k-file directory costs 100k footer fetches ONCE, amortized over
    every subsequent pruned query — instead of per query, per scan.  IO
    errors propagate (a manifest built over unreadable files would
    silently disable pruning-soundness checks downstream)."""
    files = list_data_files(spark, path)
    if not files:
        raise ValueError(f"file_stats_manifest: no parquet data files under {path!r}")
    return _sweep_stats(spark, files, columns)


def _sweep_stats(
    spark, files: list[tuple[str, int]], columns: list[str] | None
) -> DataFrame:
    """The distributed footer sweep over an explicit (uri, size) file list
    — shared by the full build (file_stats_manifest) and the incremental
    refresh (refresh_manifest, which sweeps only uncovered files)."""
    wanted = list(columns) if columns else None
    n_tasks = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    listing = spark.createDataFrame(files, "file string, size_bytes long")

    def _sweep(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for furi, fsize in zip(pdf["file"], pdf["size_bytes"]):
                filesystem, plain = _pa_fs_path(furi)
                md = pq.read_metadata(plain, filesystem=filesystem)
                names = [md.schema.column(i).path for i in range(md.num_columns)]
                idx = {n: i for i, n in enumerate(names)}
                for col in wanted if wanted is not None else names:
                    i = idx.get(col)
                    if i is None:  # not in this file's schema
                        rows.append((furi, fsize, md.num_rows, col,
                                     None, False, None, None, None, None))
                        continue
                    nulls, mins, maxs, ok = 0, [], [], True
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(i).statistics
                        if st is None or not st.has_min_max:
                            ok = False
                        else:
                            mins.append(_prunable_value(st.min, -1))
                            maxs.append(_prunable_value(st.max, +1))
                        if nulls is not None and st is not None and st.null_count is not None:
                            nulls += st.null_count
                        else:
                            nulls = None
                    if ok and mins and not any(m == (None, None) for m in mins + maxs):
                        mn_n = [m[0] for m in mins]
                        mn_s = [m[1] for m in mins]
                        numeric = mn_n[0] is not None
                        if numeric:
                            lo, hi = min(mn_n), max(m[0] for m in maxs)
                            rows.append((furi, fsize, md.num_rows, col,
                                         nulls, True, lo, hi, None, None))
                        else:
                            lo, hi = min(mn_s), max(m[1] for m in maxs)
                            rows.append((furi, fsize, md.num_rows, col,
                                         nulls, True, None, None, lo, hi))
                    else:
                        rows.append((furi, fsize, md.num_rows, col,
                                     nulls, False, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["file", "size_bytes", "n_rows", "column", "null_count",
                         "has_stats", "min_num", "max_num", "min_str", "max_str"],
            )

    return listing.repartition(n_tasks).mapInPandas(_sweep, _MANIFEST_SCHEMA)


def write_manifest(spark, path: str, columns: list[str] | None = None) -> int:
    """Persist the footer-stats manifest beside the data
    (``<path>/_stats_manifest`` — underscore-prefixed, so data scans never
    see it) and return the number of data files covered.  Rebuild after
    layout changes; pruned_read() stays SOUND on a stale manifest (files
    the manifest has never seen are always read), it just stops skipping
    the new files until the next refresh."""
    m = file_stats_manifest(spark, path, columns).cache()
    try:
        n = m.select("file").distinct().count()
        m.coalesce(1).write.mode("overwrite").parquet(
            f"{path.rstrip('/')}/{MANIFEST_DIRNAME}"
        )
    finally:
        m.unpersist()
    return n


def refresh_manifest(
    spark, path: str, columns: list[str] | None = None
) -> tuple[int, int]:
    """Incrementally reconcile the persisted manifest with the live
    directory; returns ``(files_swept, files_covered)``.  Only files the
    manifest has never seen get their footers read, and rows for files
    that no longer exist (compaction, vacuum) are dropped — so the
    per-batch maintenance step of a streaming sink or incremental append
    costs O(new files), never O(directory); the full sweep
    (write_manifest) is paid exactly once per table lifetime.  ``columns``
    defaults to whatever the existing manifest covers, keeping coverage
    uniform across refreshes.  No manifest yet → builds one (full sweep).

    The swap (stage, delete, rename) is not atomic; a concurrent
    pruned_read that catches the gap simply falls back to a fresh sweep
    of its constrained columns — slower, never wrong (and pruned_read
    reconciles against the live listing regardless, so a STALE manifest
    is also only ever a performance question)."""
    live = list_data_files(spark, path)
    if not live:
        raise ValueError(f"refresh_manifest: no parquet data files under {path!r}")
    if not _manifest_dir_exists(spark, path):
        return len(live), write_manifest(spark, path, columns)

    mdir = f"{path.rstrip('/')}/{MANIFEST_DIRNAME}"
    old = spark.read.parquet(mdir)
    coverage = old.select("file", "column").distinct().collect()
    known = {r.file for r in coverage}
    if columns is None:
        columns = sorted({r.column for r in coverage if r.column is not None})
    live_paths = {f for f, _ in live}
    new_files = [(f, s) for f, s in live if f not in known]
    dead = known - live_paths
    if not new_files and not dead:
        return 0, len(live)

    kept = old
    if dead:  # semi-join against the live list — never a giant IN literal
        live_df = spark.createDataFrame(
            [(f,) for f in sorted(live_paths)], "file string"
        )
        kept = old.join(F.broadcast(live_df), "file", "left_semi")
    updated = (
        kept.unionByName(_sweep_stats(spark, new_files, columns))
        if new_files
        else kept
    )
    staged = f"{mdir}__stage"  # '_'-prefixed sibling: hidden from data scans
    updated.coalesce(1).write.mode("overwrite").parquet(staged)

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    m, s = hpath(mdir), hpath(staged)
    fs = m.getFileSystem(hconf)
    fs.delete(m, True)
    if not fs.rename(s, m):
        raise IOError(f"refresh_manifest: could not swap {staged} into {mdir}")
    return len(new_files), len(live_paths)


def _manifest_dir_exists(spark, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/{MANIFEST_DIRNAME}")
    return p.getFileSystem(hconf).exists(p)


def prune_files(
    manifest_rows, ranges: dict[str, tuple]
) -> tuple[list[str], list[str]]:
    """(keep, dropped) file lists from collected manifest rows and closed
    range predicates ``{column: (lo, hi)}`` (either bound may be None =
    unbounded).  A file is dropped only when some constrained column's
    stats PROVE it empty under the conjunction: its [min, max] misses
    [lo, hi], or the column is entirely null there (a range predicate
    never matches null).  Missing/unsound stats keep the file — pruning
    errs toward reading.  A bound whose type doesn't order against the
    file's stats (string bound, numeric column) raises ValueError rather
    than silently keeping everything."""
    bounds = {}
    for col, (lo, hi) in ranges.items():
        lo_k = _prunable_value(lo, -1) if lo is not None else None
        hi_k = _prunable_value(hi, +1) if hi is not None else None
        for name, b, raw in (("lower", lo_k, lo), ("upper", hi_k, hi)):
            if b == (None, None):
                raise ValueError(
                    f"prune_files: {name} bound {raw!r} for {col!r} has no "
                    f"sortable manifest representation"
                )
        bounds[col] = (lo_k, hi_k)

    per_file: dict[str, list] = {}
    for r in manifest_rows:
        per_file.setdefault(r.file, []).append(r)
    keep, dropped = [], []
    for file, rows in per_file.items():
        stats = {r.column: r for r in rows}
        prunable = False
        for col, (lo_k, hi_k) in bounds.items():
            r = stats.get(col)
            if r is None:
                continue  # column not in manifest: no information
            if (
                r.null_count is not None
                and r.n_rows is not None
                and r.null_count == r.n_rows
            ):
                prunable = True  # all-null column: range predicate matches nothing
                break
            if not r.has_stats:
                continue
            numeric_stats = r.min_num is not None
            for bound, stat_val, drop_if in (
                (lo_k, r.max_num if numeric_stats else r.max_str, "below"),
                (hi_k, r.min_num if numeric_stats else r.min_str, "above"),
            ):
                if bound is None:
                    continue
                b_num, b_str = bound
                if (b_num is not None) != numeric_stats:
                    raise ValueError(
                        f"prune_files: bound for {col!r} is "
                        f"{'numeric' if b_num is not None else 'string'} but the "
                        f"file stats are {'numeric' if numeric_stats else 'string'}"
                    )
                b = b_num if numeric_stats else b_str
                if (drop_if == "below" and stat_val < b) or (
                    drop_if == "above" and stat_val > b
                ):
                    prunable = True
                    break
            if prunable:
                break
        (dropped if prunable else keep).append(file)
    return sorted(keep), sorted(dropped)


def pruned_read(
    spark,
    path: str,
    ranges: dict[str, tuple],
    manifest: DataFrame | None = None,
) -> DataFrame:
    """Read a parquet directory with FILE-level skipping: consult the
    stats manifest, drop every file whose footer stats prove it cannot
    match ``ranges``, read only the survivors — and re-apply the range
    filter IN-PLAN, so row-level correctness never depends on the stats
    (the filter also pushes down to row-group skipping inside the
    survivors; the manifest only removes the per-file footer round-trips).

    Manifest resolution: an explicit ``manifest`` argument wins, else the
    persisted ``<path>/_stats_manifest`` (Hadoop-FS existence probe, no
    read-and-catch), else a fresh distributed sweep restricted to the
    constrained columns.  Soundness against staleness: the live directory
    listing is the source of truth — files the manifest doesn't cover
    (appended since the last write_manifest) are ALWAYS read.

    Targets flat/unpartitioned layouts (zorder_write/compact_files
    output); for hive-partitioned directories use an explicit partition
    predicate instead — Catalyst's partition pruning is already
    file-level there, and reading an explicit file list would drop the
    inferred partition columns."""
    if manifest is None:
        if _manifest_dir_exists(spark, path):
            manifest = spark.read.parquet(f"{path.rstrip('/')}/{MANIFEST_DIRNAME}")
        else:
            manifest = file_stats_manifest(spark, path, columns=list(ranges))
    rows = manifest.where(F.col("column").isin(list(ranges))).collect()
    keep, dropped = prune_files(rows, ranges)
    live = [f for f, _ in list_data_files(spark, path)]
    live_set = set(live)
    covered = set(keep) | set(dropped)
    # Stale-manifest reconciliation, both directions: files the manifest
    # has never seen are ALWAYS read; manifest rows for files deleted
    # since (compaction, vacuums) must not be handed to spark.read.
    keep = [f for f in keep if f in live_set]
    keep += [f for f in live if f not in covered]

    cond = F.lit(True)
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            cond = cond & (F.col(col) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(col) <= F.lit(hi))
    if not keep:
        pruned_live = sorted(set(dropped) & live_set)
        if not pruned_live:
            raise ValueError(f"pruned_read: no parquet data files under {path!r}")
        # every file pruned: one arbitrary (live) file supplies the schema;
        # the in-plan filter (provably unsatisfiable there) returns zero
        # rows for the cost of a single footer read.
        keep = pruned_live[:1]
    return spark.read.parquet(*keep).where(cond)


# ---------------------------------------------------------------------------
# Per-file Bloom indexes: point-lookup file skipping.  Min/max stats prune
# RANGE predicates, but an equality probe on a high-cardinality column
# that the layout is not clustered on (fetch these 500 doc_ids out of a
# 100 TB corpus — the everyday "pull the flagged examples" op) intersects
# every file's [min, max].  The standard fix is a per-file Bloom filter
# over the column's hashes (Delta's bloom index, Parquet's optional bloom
# pages): no false negatives, so pruning is sound; false positives only
# cost reading a file the in-plan filter then empties.  Hashing uses
# Spark's own xxhash64 on BOTH sides (build scan and probe-value job), so
# the bitmap and the probe can never disagree on a hash function.
# ---------------------------------------------------------------------------

BLOOM_DIRNAME = "_bloom_index"  # '_'-prefixed: hidden from data scans


def _canon_uri(u: str) -> str:
    """Spark's input_file_name() renders local files as ``file:///x``
    while the Hadoop listing renders ``file:/x`` — canonicalize to the
    Hadoop form so bloom rows and live listings compare equal."""
    if u.startswith("file:///"):
        return "file:/" + u[len("file:///"):]
    return u

_BLOOM_SCHEMA = (
    "file string, column string, dtype string, m_bits long, k int, "
    "n_keys long, bitmap binary"
)


def write_file_blooms(
    spark,
    path: str,
    cols: list[str],
    m_bits: int = 1 << 20,
    k: int = 7,
) -> int:
    """One data scan → one Bloom bitmap per (file, column), persisted at
    ``<path>/_bloom_index``; returns the number of data files covered.

    Build shape: the scan projects only ``input_file_name`` + the
    xxhash64 of each indexed column (codegen, no Python until the
    bitmaps), each task accumulates ONE partial bitmap per file it saw
    (numpy bit ops over Arrow batches), and partials OR-merge in a tiny
    ``(file, column)`` aggregation whose rows are ``m_bits/8`` bytes —
    for the default 1 MiB-per-8-files bitmaps, KBs per task, never the
    hashes themselves.  Fixed ``m_bits`` keeps bitmap size predictable
    (128 KiB per file-column at the default): at 10 bits/key that is
    ~10⁵ keys per file before the false-positive rate degrades — size up
    for bigger files, the index just scales with file count."""
    if m_bits % 8 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 8, got {m_bits}")
    files = list_data_files(spark, path)
    if not files:
        raise ValueError(f"write_file_blooms: no parquet data files under {path!r}")
    rows = _bloom_rows(spark, spark.read.parquet(path), cols, m_bits, k)
    rows.coalesce(1).write.mode("overwrite").parquet(
        f"{path.rstrip('/')}/{BLOOM_DIRNAME}"
    )
    return len(files)


def _bloom_rows(
    spark, df: DataFrame, cols: list[str], m_bits: int, k: int
) -> DataFrame:
    """The bloom build plan over an arbitrary parquet-backed frame —
    shared by the full build and the incremental refresh (which feeds it
    only the uncovered files)."""
    import numpy as np
    import pandas as pd

    # Spark's xxhash64 is TYPE-sensitive (an int and a long with the same
    # numeric value hash differently), so the probe side must cast to the
    # exact data type the build hashed — record it per column.
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"bloom build: columns not in table: {missing}")
    sel = df.select(
        F.input_file_name().alias("file"),
        *[F.xxhash64(F.col(c)).alias(c) for c in cols],
    )

    def _partials(batches):
        from .bloom import _probe_positions

        acc: dict[tuple, object] = {}
        for pdf in batches:
            for file, g in pdf.groupby("file"):
                for c in cols:
                    key = (file, c)
                    if key not in acc:
                        acc[key] = [np.zeros(m_bits // 8, np.uint8), 0]
                    bm, _ = acc[key]
                    pos = _probe_positions(g[c].to_numpy(np.int64), m_bits, k)
                    pos = pos.ravel()
                    np.bitwise_or.at(
                        bm,
                        (pos >> np.uint64(3)).astype(np.int64),
                        (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                    )
                    acc[key][1] += len(g)
        if acc:
            yield pd.DataFrame(
                [
                    (_canon_uri(f), c, dtypes[c], m_bits, k, n, bm.tobytes())
                    for (f, c), (bm, n) in acc.items()
                ],
                columns=[
                    "file", "column", "dtype", "m_bits", "k", "n_keys", "bitmap"
                ],
            )

    partials = sel.mapInPandas(_partials, _BLOOM_SCHEMA)

    def _merge(key, pdf):
        bm = np.zeros(m_bits // 8, np.uint8)
        for b in pdf["bitmap"]:
            bm |= np.frombuffer(b, np.uint8)
        return pd.DataFrame(
            [
                (
                    key[0],
                    key[1],
                    pdf["dtype"].iloc[0],
                    m_bits,
                    k,
                    int(pdf["n_keys"].sum()),
                    bm.tobytes(),
                )
            ],
            columns=["file", "column", "dtype", "m_bits", "k", "n_keys", "bitmap"],
        )

    return partials.groupBy("file", "column").applyInPandas(_merge, _BLOOM_SCHEMA)


def refresh_file_blooms(spark, path: str) -> tuple[int, int]:
    """Incrementally reconcile the bloom index with the live directory;
    returns ``(files_scanned, files_covered)``.  Only files without bloom
    rows get their data scanned (with the index's recorded columns,
    m_bits and k, so bitmaps stay uniform), and rows for deleted files
    are dropped — the per-batch maintenance twin of refresh_manifest,
    with the same staged swap and the same staleness contract (a stale
    or mid-swap index only ever costs extra reads in
    bloom_pruned_lookup, never missed rows).  Requires an existing index
    (the column choice is a design decision write_file_blooms owns)."""
    bdir = f"{path.rstrip('/')}/{BLOOM_DIRNAME}"
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(bdir).getFileSystem(hconf)
    if not fs.exists(hpath(bdir)):
        raise ValueError(
            f"refresh_file_blooms: no bloom index at {bdir!r}; run "
            f"write_file_blooms first to choose the indexed columns"
        )
    live = list_data_files(spark, path)
    if not live:
        raise ValueError(f"refresh_file_blooms: no parquet data files under {path!r}")

    old = spark.read.parquet(bdir)
    meta = old.select("file", "column", "m_bits", "k").collect()
    known = {r.file for r in meta}
    cols = sorted({r.column for r in meta})
    m_bits, k = int(meta[0].m_bits), int(meta[0].k)
    live_paths = {f for f, _ in live}
    new_files = [f for f, _ in live if f not in known]
    dead = known - live_paths
    if not new_files and not dead:
        return 0, len(live_paths)

    kept = old
    if dead:
        live_df = spark.createDataFrame(
            [(f,) for f in sorted(live_paths)], "file string"
        )
        kept = old.join(F.broadcast(live_df), "file", "left_semi")
    updated = kept
    if new_files:
        updated = kept.unionByName(
            _bloom_rows(spark, spark.read.parquet(*new_files), cols, m_bits, k)
        )
    staged = f"{bdir}__stage"
    updated.coalesce(1).write.mode("overwrite").parquet(staged)
    fs.delete(hpath(bdir), True)
    if not fs.rename(hpath(staged), hpath(bdir)):
        raise IOError(f"refresh_file_blooms: could not swap {staged} into {bdir}")
    return len(new_files), len(live_paths)


def _xxhash64_values(spark, values: list, target_dtype: str) -> list[int]:
    """Spark's xxhash64 of each probe value CAST to the indexed column's
    recorded type, computed BY Spark on a literal one-column plan — the
    only way to guarantee the probe hashes match what the build scan's
    xxhash64 produced (xxhash64 is type-sensitive, and a Python
    reimplementation drifting by a seed or a coercion would silently
    break the no-false-negative guarantee).  Bounded metadata job:
    len(values) rows."""
    py_type = {int: "long", float: "double", str: "string", bool: "boolean"}.get(
        type(values[0])
    )
    if py_type is None:
        raise ValueError(
            f"bloom probe values of type {type(values[0]).__name__} unsupported"
        )
    probe = spark.createDataFrame([(v,) for v in values], f"v {py_type}")
    return [
        r.h
        for r in probe.select(
            F.xxhash64(F.col("v").cast(target_dtype)).alias("h")
        ).collect()
    ]


def bloom_prune_files(
    spark, path: str, col: str, values: list
) -> tuple[list[str], list[str]]:
    """(keep, dropped) for a point lookup: a file is dropped only when its
    Bloom bitmap proves NONE of the probe values can be present.  The
    membership test runs DISTRIBUTED over the bloom table (each row tests
    len(values)*k bit probes in numpy); only file names come back to the
    driver — bitmaps never do.  Files without a bloom row (appended since
    write_file_blooms, or an unindexed column) are kept."""
    import numpy as np
    import pandas as pd

    if not values:
        raise ValueError("bloom_prune_files: empty probe value list")
    bdir = f"{path.rstrip('/')}/{BLOOM_DIRNAME}"
    live = [f for f, _ in list_data_files(spark, path)]
    jvm = spark.sparkContext._jvm
    bpath = jvm.org.apache.hadoop.fs.Path(bdir)
    if not bpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    ).exists(bpath):
        return sorted(live), []  # no index: nothing prunable

    bloom_df = spark.read.parquet(bdir).where(F.col("column") == col)
    first = bloom_df.select("dtype").first()
    if first is None:
        return sorted(live), []  # column not indexed: nothing prunable
    hashes = np.array(
        _xxhash64_values(spark, values, first.dtype), dtype=np.int64
    )

    def _test(batches):
        from .bloom import _probe_positions

        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                bm = np.frombuffer(r["bitmap"], np.uint8)
                pos = _probe_positions(hashes, int(r["m_bits"]), int(r["k"]))
                byte_i = (pos >> np.uint64(3)).astype(np.int64)
                bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
                hit = ((bm[byte_i] & bit) != 0).all(axis=1).any()
                out.append((r["file"], bool(hit)))
            yield pd.DataFrame(out, columns=["file", "might"])

    verdicts = bloom_df.mapInPandas(_test, "file string, might boolean").collect()
    might = {_canon_uri(r.file): r.might for r in verdicts}
    keep = [f for f in live if might.get(f, True)]
    dropped = [f for f in live if not might.get(f, True)]
    return sorted(keep), sorted(dropped)


def bloom_pruned_lookup(spark, path: str, col: str, values: list) -> DataFrame:
    """Point lookup with file-level Bloom skipping: read only the files
    that might contain one of ``values``, re-applying the exact ``isin``
    filter IN-PLAN — Bloom false positives die there, and no false
    negatives means no missed rows.  Live-listing reconciliation as in
    pruned_read: unindexed/appended files are always read."""
    keep, dropped = bloom_prune_files(spark, path, col, values)
    cond = F.col(col).isin(values)
    if not keep:
        if not dropped:
            raise ValueError(
                f"bloom_pruned_lookup: no parquet data files under {path!r}"
            )
        keep = dropped[:1]  # schema carrier; filter provably matches nothing
    return spark.read.parquet(*keep).where(cond)


def skew_stats(
    df: DataFrame, key_cols: list[str], top_n: int = 10
) -> DataFrame:
    """Per-key-group skew diagnostics: the ``top_n`` heaviest keys with
    their share of the table and the ratio to a perfectly uniform key —
    the pre-flight check that decides whether a join/agg on these keys
    needs salting or AQE skew handling.  One aggregation shuffle; the
    grand totals re-enter via broadcast."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("key_rows"))
    totals = counts.agg(
        F.sum("key_rows").alias("_total"),
        F.count("*").alias("_n_keys"),
    )
    # global top-N first (TakeOrderedAndProject: per-partition heaps, driver
    # merges top_n*partitions rows — never a single-partition sort of every
    # distinct key), THEN the rank window over the tiny surviving set
    top = counts.orderBy(F.desc("key_rows"), *key_cols).limit(top_n)
    w = Window.orderBy(F.desc("key_rows"), *key_cols)
    return (
        top.join(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            *key_cols,
            "key_rows",
            F.round(F.col("key_rows") / F.col("_total"), 6).alias("share"),
            F.round(
                # double BEFORE the multiply: long*long overflows int64 at
                # ~1e10 rows x 1e9 keys — precisely the scale this
                # diagnostic exists for
                F.col("key_rows").cast("double") * F.col("_n_keys") / F.col("_total"),
                3,
            ).alias("vs_uniform"),
        )
    )


# ---------------------------------------------------------------------------
# Scratch vacuum: crash litter from the engine's stage-and-swap writers.
# Every staged protocol here is crash-SAFE (a complete copy of the data
# exists at every step) but not crash-CLEAN: an interrupted swap leaves
# its scratch sibling behind, an interrupted WET export leaves attempt
# files, and a killed Spark write job leaves `_temporary`.  None of them
# corrupt reads (dot/underscore prefixes hide them from Spark's file
# index; `.tmp-` files are invisible to the WET reader's glob), but at
# 100 TB they hold real storage until something deletes them.
# ---------------------------------------------------------------------------

import re as _re

_VACUUM_DIR_PATTERNS = (
    _re.compile(r"^\.compact_stage__"),   # compact_files swap scratch
    _re.compile(r"^\.compact_old__"),
    _re.compile(r"_rebuild_stage$"),      # rebalance_ivf_index staging
    _re.compile(r"_rebuild_old$"),
    _re.compile(r"_truncate_stage$"),     # truncate_change_log staging
    _re.compile(r"_truncate_old$"),
    _re.compile(r"^_temporary$"),         # crashed Spark write job attempts
)
_VACUUM_FILE_PATTERN = _re.compile(r"\.tmp-\d+$")  # write_wet attempt files


def _subtree_max_mtime(fs, path, floor_ms: float) -> float:
    """Newest modification time anywhere under ``path`` (inclusive).
    Metadata-only walk; used to age `_temporary` dirs whose top-level
    mtime stays stale while task attempts write underneath."""
    newest = floor_ms
    stack = [path]
    while stack:
        d = stack.pop()
        for st in fs.listStatus(d):
            if st.getModificationTime() > newest:
                newest = st.getModificationTime()
            if st.isDirectory():
                stack.append(st.getPath())
    return newest


def vacuum_scratch(
    spark,
    root: str,
    min_age_seconds: float = 86400.0,
    dry_run: bool = False,
) -> dict:
    """Delete crash litter under ``root``: stage/aside scratch dirs from
    the swap protocols (`compact_files`, `rebalance_ivf_index`), Spark
    `_temporary` job-attempt dirs, and `write_wet` ``.tmp-<attempt>``
    files.  LIVE data is never matched — the patterns are exactly the
    engine's own scratch names, and anything younger than
    ``min_age_seconds`` is left alone so an in-flight swap or export is
    never raced (default one day; an active stage dir keeps a fresh
    modification time).

    Hadoop FileSystem API throughout (works on anything Spark reaches).
    Driver-side METADATA walk only — one listStatus sweep, no data read;
    run it per table/prefix on a schedule, the same operational slot as
    Delta VACUUM.  ``dry_run=True`` reports without deleting.

    Returns ``{"removed": [paths], "freed_bytes": n, "entries_scanned": n}``.
    """
    import time

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    rp = hpath(root)
    fs = rp.getFileSystem(hconf)
    if not fs.exists(rp):
        raise ValueError(f"vacuum_scratch: {root} does not exist")
    cutoff_ms = (time.time() - min_age_seconds) * 1000.0
    removed: list[str] = []
    freed = 0
    scanned = 0
    stack = [rp]
    while stack:
        d = stack.pop()
        for st in fs.listStatus(d):
            scanned += 1
            p = st.getPath()
            name = p.getName()
            is_dir = st.isDirectory()
            doomed = (
                any(pat.search(name) for pat in _VACUUM_DIR_PATTERNS)
                if is_dir
                else bool(_VACUUM_FILE_PATTERN.search(name))
            )
            age_stamp_ms = st.getModificationTime()
            if doomed and is_dir and name == "_temporary":
                # A live Spark write refreshes mtimes only in the nested
                # task-attempt subdirs (FileOutputCommitter), not on the
                # top-level _temporary itself — age the NEWEST entry in the
                # subtree so an in-flight job is never raced at commit.
                age_stamp_ms = _subtree_max_mtime(fs, p, age_stamp_ms)
            if doomed and age_stamp_ms <= cutoff_ms:
                size = (
                    fs.getContentSummary(p).getLength() if is_dir else st.getLen()
                )
                freed += int(size)
                removed.append(str(p.toUri().getPath()))
                if not dry_run:
                    fs.delete(p, True)
            elif is_dir and not doomed:
                # keep walking; doomed dirs are never entered (a young one
                # is an in-flight swap — leave its insides alone too)
                stack.append(p)
    return {
        "removed": sorted(removed),
        "freed_bytes": int(freed),
        "entries_scanned": scanned,
    }
