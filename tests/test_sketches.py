"""Mergeable HLL sketch profiling (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_search_databricks_poc_spark import queries_registry as R
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.sketches import (
    shard_sketches,
    sketch_profile,
    union_estimate,
)


def test_sketch_profile_accuracy(spark):
    """HLL at lg_k=12 is well under 5% relative error at fixture scale."""
    rows = R.QUERIES["sketch_cardinality_profile"](spark, SF_DIR).collect()
    assert {r.col for r in rows} == {"doc_id", "lang", "n_chars"}
    for r in rows:
        assert r.exact > 0
        assert abs(r.rel_err) < 0.05, (r.col, r.exact, r.estimate)


def test_union_of_shard_sketches_tracks_whole_table_sketch(spark):
    """Merge correctness: unioning per-shard sketches lands within HLL
    error of both the single whole-table sketch and the exact count.  (The
    union gadget is not bit-identical to a one-shot sketch — datasketches
    unions through a common representation — so exact equality is not the
    contract; bounded error is.)"""
    d = load_table(spark, SF_DIR, "documents")
    per_shard = union_estimate(shard_sketches(d, "source", "doc_id")).first()
    exact = d.select("doc_id").distinct().count()
    assert abs(per_shard.estimate - exact) / exact < 0.05
    assert per_shard.n_rows == d.count()


def test_incremental_union_new_shard(spark):
    """The incremental-profile contract: when a new shard lands, its sketch
    unions with the PERSISTED old sketches — no rescan of old shards — and
    the estimate matches profiling everything from scratch."""
    d = load_table(spark, SF_DIR, "documents")
    old = d.where(F.col("source") != "src0")
    new = d.where(F.col("source") == "src0")
    old_sketches = shard_sketches(old, "source", "doc_id").collect()
    new_sketches = shard_sketches(new, "source", "doc_id").collect()
    combined = spark.createDataFrame(
        old_sketches + new_sketches, shard_sketches(d, "source", "doc_id").schema
    )
    merged = union_estimate(combined).first()
    exact = d.select("doc_id").distinct().count()
    # HLL estimates are order-sensitive at the margin (HIP estimator), so
    # the contract is bounded error, not bit-equality with a from-scratch run
    assert abs(merged.estimate - exact) / exact < 0.05


def test_sketch_profile_multicolumn_shapes(spark):
    d = load_table(spark, SF_DIR, "documents")
    out = sketch_profile(d, ["lang"], shard_col="source").collect()
    assert len(out) == 1 and out[0].col == "lang"
    n_langs = d.select("lang").distinct().count()
    assert out[0].exact == n_langs
