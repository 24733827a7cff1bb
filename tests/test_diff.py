"""Snapshot diff → change feed (operators/diff.py).

The diff must be exact (null-safe, array-aware), its pruned variant must
equal it bit-for-bit, and its output must drive the same incremental-sync
machinery a real change feed does (reference contract: Delta CDF,
syntetic_data.py:69-78)."""

from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.diff import (
    append_diff_to_change_log,
    apply_diff,
    bucket_fingerprints,
    changed_buckets,
    diff_to_sync_batch,
    snapshot_diff,
    snapshot_diff_pruned,
)


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, a string, b string")


def test_ops_classified_null_safe(spark):
    old = _mk(spark, [(1, "x", None), (2, "y", "k"), (3, "z", "z"), (4, None, "w")])
    new = _mk(spark, [(2, "y", "k"), (3, "z2", "z"), (4, None, "w"), (5, "n", None)])
    got = _pairs(snapshot_diff(old, new, "id").select("id", "op"))
    assert got == [(1, "delete"), (3, "update"), (5, "insert")]
    # null -> value and value -> null are both updates, not unchanged
    old2 = _mk(spark, [(1, None, "v"), (2, "v", None)])
    new2 = _mk(spark, [(1, "v", "v"), (2, "v", "q")])
    got2 = _pairs(snapshot_diff(old2, new2, "id").select("id", "op"))
    assert got2 == [(1, "update"), (2, "update")]


def test_include_unchanged_and_subset_columns(spark):
    old = _mk(spark, [(1, "x", "p"), (2, "y", "q")])
    new = _mk(spark, [(1, "x", "DIFFERENT"), (2, "y2", "q")])
    # comparing only column a: row 1 is unchanged despite b differing
    d = snapshot_diff(old, new, "id", compare_cols=["a"], include_unchanged=True)
    assert _pairs(d.select("id", "op")) == [(1, "unchanged"), (2, "update")]


def test_apply_diff_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    new = docs
    old = (
        docs.where(F.col("doc_id") % 13 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0, F.upper("text"))
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
        )
        .unionByName(
            docs.where(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text", "lang"
            )
        )
    )
    diff = snapshot_diff(old, new, "doc_id")
    rebuilt = apply_diff(old, diff, "doc_id")
    assert _pairs(rebuilt) == _pairs(new)


def test_pruned_equals_exact_and_prunes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    # localized churn: 3 edits, 2 deletes, 1 insert over ~500 docs
    old = docs
    new = (
        docs.where(~F.col("doc_id").isin(41, 42))
        .select(
            "doc_id",
            F.when(F.col("doc_id").isin(7, 70, 77), F.lit("edited"))
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
        )
        .unionByName(
            spark.createDataFrame(
                [(1_000_001, "fresh", "en")], "doc_id long, text string, lang string"
            )
        )
    )
    exact = snapshot_diff(old, new, "doc_id")
    pruned = snapshot_diff_pruned(old, new, "doc_id", n_buckets=64)
    assert _pairs(pruned) == _pairs(exact)
    # the fingerprint pass isolates the churn to few buckets: 6 touched ids
    # can hit at most 6 of the 64
    n_changed = changed_buckets(
        bucket_fingerprints(old, "doc_id", ["text", "lang"], 64),
        bucket_fingerprints(new, "doc_id", ["text", "lang"], 64),
    ).count()
    assert 1 <= n_changed <= 6


def test_fingerprint_sees_null_value_swaps(spark):
    """xxhash64 skips null arguments, so (null,'a') vs ('a',null) would
    alias without the per-column null flags — the pruned diff must still
    report the update."""
    old = _mk(spark, [(1, None, "a"), (2, "keep", "keep")])
    new = _mk(spark, [(1, "a", None), (2, "keep", "keep")])
    got = _pairs(snapshot_diff_pruned(old, new, "id", n_buckets=4).select("id", "op"))
    assert got == [(1, "update")]


def test_diff_drives_incremental_upsert(spark, sf_dir, tmp_path):
    """End-to-end A6 closure without a change-tracked source: sync an IVF
    index from a snapshot pair and land on the same searchable state as an
    index built from the new snapshot directly."""
    from vector_search_databricks_poc_spark.operators.incremental import (
        incremental_upsert,
    )
    from vector_search_databricks_poc_spark.operators.index import build_ivf_index

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = e
    v7 = e.where(F.col("vec_id") == 7).first()["embedding"]
    v11 = e.where(F.col("vec_id") == 11).first()["embedding"]
    new = e.where(~F.col("vec_id").isin(3, 5)).unionByName(  # 5 deleted
        spark.createDataFrame(
            [(3, list(v7)), (900_001, list(v11))],  # 3 updated, 900001 inserted
            "vec_id long, embedding array<float>",
        )
    )

    idx = build_ivf_index(old, str(tmp_path / "idx"), k_centroids=4)
    diff = snapshot_diff(old, new, "vec_id")
    assert _pairs(diff.select("vec_id", "op")) == [
        (3, "update"),
        (5, "delete"),
        (900_001, "insert"),
    ]
    changed, deleted = diff_to_sync_batch(diff, "vec_id")
    assert incremental_upsert(spark, idx, changed, deleted=deleted) == 2

    table = spark.read.parquet(idx.path)
    assert table.count() == new.count()
    assert table.where(F.col("vec_id") == 5).count() == 0
    assert table.where(F.col("vec_id") == 3).count() == 1
    # updated and inserted rows are findable at their new vectors
    hits = idx.search(spark, [float(x) for x in v7], k=2, nprobe=4).collect()
    assert {h["vec_id"] for h in hits} >= {3, 7}
    hits11 = idx.search(spark, [float(x) for x in v11], k=2, nprobe=4).collect()
    assert {h["vec_id"] for h in hits11} >= {11, 900_001}


def test_change_log_append(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where(F.col("doc_id") < 100)
    new = docs.where((F.col("doc_id") < 98) | (F.col("doc_id") == 200))
    log = str(tmp_path / "log")
    n = append_diff_to_change_log(
        spark, snapshot_diff(old, new, "doc_id"), log, "doc_id"
    )
    rows = spark.read.parquet(log)
    assert n == rows.count() == 3  # 98, 99 deleted; 200 inserted
    assert rows.select("batch_seq").distinct().collect()[0][0] == 0
    # second append advances the sequence
    n2 = append_diff_to_change_log(
        spark, snapshot_diff(new, old, "doc_id"), log, "doc_id"
    )
    assert n2 == 3
    assert spark.read.parquet(log).agg(F.max("batch_seq")).first()[0] == 1
