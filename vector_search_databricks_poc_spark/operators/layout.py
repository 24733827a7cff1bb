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
    return n


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
