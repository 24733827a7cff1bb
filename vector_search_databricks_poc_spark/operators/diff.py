"""Snapshot diff: derive a change feed from two arbitrary table snapshots.

The reference's incremental-sync contract rides Delta Change Data Feed —
the source table records its own changes and the index syncs only those
(reference src/databricks/syntetic_data.py:69-78).  When the upstream is
NOT change-tracked (a vendor re-drop, a re-exported parquet corpus, a
restored backup), the change set must be DERIVED by comparing snapshots.
``snapshot_diff`` computes exactly the ``(id, op, post-image)`` batch that
``operators.incremental.incremental_upsert`` consumes, so an index syncs
from snapshot pairs with the same touched-partition cost profile as a real
change feed; ``append_diff_to_change_log`` writes the same rows into the
self-written ``_changes`` log the streaming sync replays.

Scale design (100 TB):

- ``snapshot_diff`` is ONE full-outer sort-merge join on the id — one
  shuffle per side, no driver state, fully lazy.  Comparison is per-column
  null-safe equality (``<=>``) inside codegen: exact, no hash-collision
  caveat, arrays/structs included.  If both snapshots are bucketed/
  pre-partitioned by id the shuffle disappears entirely.
- ``snapshot_diff_pruned`` is the churn-localized fast path: each side
  aggregates per-bucket fingerprints (map-side partials → ``n_buckets``
  rows), the differing buckets broadcast back as a semi-join filter, and
  only rows in changed buckets reach the full-outer join.  The inputs are
  scanned twice, but the expensive corpus-vs-corpus SHUFFLE shrinks to the
  changed fraction — at 1% churn, 99% of both tables never leaves the map
  side.  The fingerprint is (count, bit_xor, wide-decimal sum) of a
  per-row xxhash64 — order-independent and overflow-free under ANSI; a
  changed bucket passing all three checks needs a simultaneous 64-bit
  xor + sum + count collision (~2^-128): documented probabilistic, with
  ``snapshot_diff`` as the exact fallback.  Null-ness is hashed as an
  explicit per-column boolean because Spark's hash functions SKIP null
  arguments (``hash(null, x) == hash(x)``), which would otherwise alias
  value-swaps across nullable columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

OPS = ("insert", "update", "delete")


def _compare_cols(old: DataFrame, new: DataFrame, id_col: str,
                  compare_cols: list[str] | None) -> list[str]:
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c != id_col and c in old.columns]
    missing = [c for c in compare_cols
               if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare columns {missing} absent from a snapshot")
    if not compare_cols:
        raise ValueError("no common non-id columns to compare")
    return compare_cols


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level change set between two snapshots keyed by ``id_col``.

    Returns ``(id_col, op, *compare_cols)`` where ``op`` ∈ ``insert`` /
    ``update`` / ``delete`` (plus ``unchanged`` when asked) and the value
    columns carry the POST-image (null for deletes) — the exact shape
    ``diff_to_sync_batch`` splits for ``incremental_upsert``.

    ``compare_cols`` defaults to every non-id column present in BOTH
    snapshots; columns private to one side are ignored rather than
    reported as universal change.
    """
    compare_cols = _compare_cols(old, new, id_col, compare_cols)
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col(f"o.{id_col}") == F.col(f"n.{id_col}"), "full_outer")
    differs = None
    for c in compare_cols:
        d = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        differs = d if differs is None else (differs | d)
    op = (
        F.when(F.col(f"o.{id_col}").isNull(), F.lit("insert"))
        .when(F.col(f"n.{id_col}").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        F.coalesce(F.col(f"n.{id_col}"), F.col(f"o.{id_col}")).alias(id_col),
        op.alias("op"),
        *[F.col(f"n.{c}").alias(c) for c in compare_cols],
    )
    if not include_unchanged:
        out = out.where(F.col("op") != "unchanged")
    return out


def _row_hash(id_col: str, compare_cols: list[str]) -> Column:
    # explicit null flags: xxhash64 SKIPS null arguments, so without them
    # (null,'a') and ('a',null) across two nullable columns hash alike
    parts: list[Column] = [F.col(id_col)]
    for c in compare_cols:
        parts.append(F.struct(F.col(c).isNull().alias("isnull"),
                              F.col(c).alias("v")))
    return F.xxhash64(*parts)


def bucket_fingerprints(
    df: DataFrame,
    id_col: str,
    compare_cols: list[str],
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-bucket content fingerprints: ``(bucket, n_rows, fp_xor,
    fp_sum)``.  Order-independent (xor and sum commute), map-side
    combinable, and overflow-free (the sum rides ``decimal(38,0)``, which
    holds ~10^19 full-range longs).  One tiny shuffle of ``n_buckets``
    rows."""
    h = _row_hash(id_col, compare_cols)
    return (
        df.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).alias("bucket"),
            h.alias("_h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(_h)").alias("fp_xor"),
            F.sum(F.col("_h").cast("decimal(38,0)")).alias("fp_sum"),
        )
    )


def changed_buckets(old_fps: DataFrame, new_fps: DataFrame) -> DataFrame:
    """Buckets whose fingerprints disagree (single ``bucket`` column) —
    includes buckets present on only one side."""
    o, n = old_fps.alias("o"), new_fps.alias("n")
    same = (
        F.col("o.n_rows").eqNullSafe(F.col("n.n_rows"))
        & F.col("o.fp_xor").eqNullSafe(F.col("n.fp_xor"))
        & F.col("o.fp_sum").eqNullSafe(F.col("n.fp_sum"))
    )
    return (
        o.join(n, F.col("o.bucket") == F.col("n.bucket"), "full_outer")
        .where(~same)
        .select(F.coalesce(F.col("o.bucket"), F.col("n.bucket")).alias("bucket"))
    )


def snapshot_diff_pruned(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: list[str] | None = None,
    n_buckets: int = 1024,
    include_unchanged: bool = False,
) -> DataFrame:
    """``snapshot_diff`` restricted to fingerprint-differing buckets —
    same output, one lazy plan.  The changed-bucket list is at most
    ``n_buckets`` rows, so it broadcasts into both semi-joins; unchanged
    buckets never enter the full-outer shuffle.  ``include_unchanged``
    only surfaces unchanged rows from CHANGED buckets (an unchanged
    bucket proves all its rows unchanged), so the default diff-only
    output is what matches ``snapshot_diff`` exactly."""
    compare_cols = _compare_cols(old, new, id_col, compare_cols)
    changed = changed_buckets(
        bucket_fingerprints(old, id_col, compare_cols, n_buckets),
        bucket_fingerprints(new, id_col, compare_cols, n_buckets),
    )

    hot = F.broadcast(changed)

    def restrict(df: DataFrame) -> DataFrame:
        bucketed = df.withColumn(
            "_bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
        )
        return (
            bucketed.join(hot, bucketed["_bucket"] == hot["bucket"], "left_semi")
            .drop("_bucket")
        )

    return snapshot_diff(
        restrict(old), restrict(new), id_col, compare_cols,
        include_unchanged=include_unchanged,
    )


def apply_diff(old: DataFrame, diff: DataFrame, id_col: str) -> DataFrame:
    """Reconstruct the new snapshot from the old one plus a diff:
    drop every diffed id, then add back insert/update post-images.
    ``apply_diff(old, snapshot_diff(old, new), id)`` ≡ ``new`` on the
    compared columns (tested)."""
    value_cols = [c for c in diff.columns if c not in (id_col, "op")]
    keyed = diff.select(id_col, "op", *value_cols)
    survivors = old.select(id_col, *value_cols).join(
        keyed.select(id_col), id_col, "left_anti"
    )
    post = keyed.where(F.col("op") != "delete").drop("op")
    return survivors.unionByName(post)


def diff_to_sync_batch(diff: DataFrame, id_col: str) -> tuple[DataFrame, DataFrame]:
    """Split a diff into the ``(changed, deleted)`` pair
    ``incremental_upsert`` consumes: post-image rows for inserts+updates,
    bare ids for deletes."""
    value_cols = [c for c in diff.columns if c not in (id_col, "op")]
    changed = diff.where(F.col("op").isin("insert", "update")).select(
        id_col, *value_cols
    )
    deleted = diff.where(F.col("op") == "delete").select(id_col)
    return changed, deleted


def append_diff_to_change_log(
    spark: SparkSession, diff: DataFrame, log_path: str, id_col: str
) -> int:
    """Append a snapshot-derived diff to the self-written change log
    (same ``(id, op, batch_seq, ts)`` schema ``incremental_upsert``
    writes), so ``stream_change_log_sync`` replays external snapshot
    churn exactly like engine-written changes.  Returns rows logged."""
    from .incremental import _next_batch_seq

    rows = diff.where(F.col("op").isin(*OPS)).select(id_col, "op").localCheckpoint()
    n = rows.count()
    if not n:
        return 0
    seq = _next_batch_seq(spark, log_path)
    (
        rows.select(
            id_col,
            "op",
            F.lit(seq).cast("long").alias("batch_seq"),
            F.current_timestamp().alias("ts"),
        )
        .write.mode("append")
        .parquet(log_path)
    )
    return n
