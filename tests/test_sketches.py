"""Mergeable HLL sketch profiling (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_search_databricks_poc_spark import queries_registry as R
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.sketches import (
    frequent_item_candidates,
    heavy_hitters,
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


def test_heavy_hitters_matches_duckdb_oracle(spark):
    """The 2-pass candidate/recount result is EXACT: value-identical to
    DuckDB's plain GROUP BY / HAVING over the same parquet (mean-relative
    threshold, the declared query's shape)."""
    from tests.oracle_utils import compare, duck_connection

    duck = duck_connection(SF_DIR)

    out = R.QUERIES["heavy_hitters"](spark, SF_DIR)
    r = compare(
        out,
        duck,
        """
        SELECT user_id, COUNT(*) AS cnt
        FROM events
        GROUP BY user_id
        HAVING COUNT(*) >= 1.2 * (
            SELECT COUNT(*)::DOUBLE / COUNT(DISTINCT user_id) FROM events
        )
        """,
    )
    assert r["values_match"], r
    assert out.count() >= 1


def test_heavy_hitters_nonempty_at_bench_scale(spark):
    """The bench probe at sf0.1 must exercise a non-empty result — a broken
    recount pass would also return 0 rows, so an empty bench result carries
    no regression signal (round-3 verdict item)."""
    out = R.QUERIES["heavy_hitters"](spark, "/root/testdata/sf0.1")
    assert out.count() >= 5


def test_relative_heavy_hitters_scale_invariant(spark):
    """The mean-relative threshold finds the same planted hot keys when the
    table is replicated 10× with 10× the key domain — exactly the shape
    where a fixed frequency fraction degrades to an empty result."""
    from vector_search_databricks_poc_spark.operators.sketches import (
        relative_heavy_hitters,
    )

    def table(n_keys):
        # every key appears 10×, except one "whale" per 50 keys at 100×
        rows = []
        for k in range(n_keys):
            reps = 100 if k % 50 == 0 else 10
            rows += [(k,)] * reps
        return spark.createDataFrame(rows, ["k"]).repartition(8)

    small = {r.k for r in relative_heavy_hitters(table(100), "k", 2.0).collect()}
    big = {r.k for r in relative_heavy_hitters(table(1000), "k", 2.0).collect()}
    assert small == {0, 50}
    assert big == {k for k in range(1000) if k % 50 == 0}


def test_heavy_hitters_planted_skew(spark):
    """A planted dominant key is found across many partitions, with its
    exact global count; near-threshold keys on the wrong side are excluded."""
    rows = [(i, "whale" if i % 5 != 4 else f"u{i % 97}") for i in range(10_000)]
    df = spark.createDataFrame(rows, ["i", "k"]).repartition(16)
    out = {r.k: r.cnt for r in heavy_hitters(df, "k", threshold_frac=0.5).collect()}
    assert out == {"whale": 8000}


def test_heavy_hitters_no_qualifying_keys(spark):
    """All-unique keys with a high threshold: empty result, no error."""
    df = spark.createDataFrame([(i, f"k{i}") for i in range(500)], ["i", "k"])
    assert heavy_hitters(df, "k", threshold_frac=0.1).count() == 0


def test_heavy_hitters_empty_input(spark):
    df = spark.createDataFrame([], "k string, v long")
    assert heavy_hitters(df, "k", threshold_frac=0.1).count() == 0


def test_frequent_item_candidates_superset_and_cap(spark):
    """Misra–Gries per-partition summaries: ≤ counters rows per partition,
    and the union contains every key with global frequency > n/(counters+1)."""
    rows = [(i, f"hot{i % 3}" if i % 2 == 0 else f"cold{i}") for i in range(6_000)]
    df = spark.createDataFrame(rows, ["i", "k"]).repartition(8)
    counters = 16
    cands = frequent_item_candidates(df, "k", counters=counters)
    per_part = cands.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert all(r["count"] <= counters for r in per_part)
    cand_keys = {r.k for r in cands.select("k").distinct().collect()}
    n = df.count()
    exact = df.groupBy("k").count().where(F.col("count") > n / (counters + 1))
    hot = {r.k for r in exact.collect()}
    assert hot <= cand_keys, hot - cand_keys


def test_quantile_profile_within_bin_width(spark):
    """Histogram quantile estimates are within one bin width of the exact
    percentile at every requested p (the operator's error bound)."""
    rows = R.QUERIES["quantile_profile"](spark, SF_DIR).collect()
    assert [r.p for r in rows] == [0.25, 0.5, 0.9, 0.99]
    for r in rows:
        assert r.abs_err <= r.bin_width + 1e-9, (r.p, r.abs_err, r.bin_width)


def test_shard_histograms_merge_is_additive(spark):
    """The incremental contract: with PINNED bounds, histograms of two
    disjoint subsets built in separate runs merge (bucket-count addition)
    into exactly the whole-table histogram — no rescan of old shards."""
    from vector_search_databricks_poc_spark.operators.sketches import (
        shard_histograms,
    )

    o = load_table(spark, SF_DIR, "orders")
    lo, hi = o.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).first()
    pinned = (float(lo), float(hi))

    def merged_counts(df):
        h = shard_histograms(df, "o_orderpriority", "o_totalprice", bins=32, bounds=pinned)
        return {
            r.bucket: r.cnt
            for r in h.groupBy("bucket").agg(F.sum("cnt").alias("cnt")).collect()
        }

    whole = merged_counts(o)
    old = merged_counts(o.where(F.col("o_orderpriority") != "1-URGENT"))
    new = merged_counts(o.where(F.col("o_orderpriority") == "1-URGENT"))
    summed = {
        b: old.get(b, 0) + new.get(b, 0) for b in set(old) | set(new)
    }
    assert summed == whole


def test_histogram_quantiles_exact_on_uniform_keys(spark):
    """Deterministic check on a known distribution: quantiles of 1..10000
    land within one bin of the true value."""
    from vector_search_databricks_poc_spark.operators.sketches import (
        histogram_quantiles,
        shard_histograms,
    )

    df = spark.range(1, 10_001).select(
        F.col("id").alias("v"), (F.col("id") % 4).alias("shard")
    )
    hist = shard_histograms(df, "shard", "v", bins=100)
    out = {r.p: r.estimate for r in histogram_quantiles(hist, (0.5, 0.9)).collect()}
    assert abs(out[0.5] - 5000) <= 100, out
    assert abs(out[0.9] - 9000) <= 100, out


def test_distribution_drift_zero_for_identical(spark):
    from vector_search_databricks_poc_spark.operators.sketches import (
        distribution_drift,
    )

    o = load_table(spark, SF_DIR, "orders").select("o_totalprice")
    r = distribution_drift(o, o, "o_totalprice").first()
    assert r.tv_distance == 0.0
    assert r.n_old == r.n_new


def test_distribution_drift_detects_shift(spark):
    """A mean shift of half the range produces large TV distance; a tiny
    jitter produces a small one — and both stay in [0, 1]."""
    from vector_search_databricks_poc_spark.operators.sketches import (
        distribution_drift,
    )

    base = spark.range(10_000).select((F.col("id") % 1000).cast("double").alias("v"))
    shifted = base.select((F.col("v") + 800).alias("v"))
    jitter = base.select((F.col("v") + 1).alias("v"))
    big = distribution_drift(base, shifted, "v").first().tv_distance
    small = distribution_drift(base, jitter, "v").first().tv_distance
    assert 0 <= small < 0.1 < big <= 1, (small, big)


def test_sketch_ops_empty_inputs_degrade_gracefully(spark):
    """Empty inputs: no crashes — empty histograms/quantiles return no
    rows, drift against an empty snapshot reports null (undefined), and
    the counts that ARE defined stay correct."""
    from vector_search_databricks_poc_spark.operators.sketches import (
        distribution_drift,
        histogram_quantiles,
        quantile_profile,
        shard_histograms,
    )

    empty = spark.createDataFrame([], "shard string, v double")
    assert shard_histograms(empty, "shard", "v").count() == 0
    assert (
        histogram_quantiles(shard_histograms(empty, "shard", "v"), (0.5,)).count() == 0
    )
    assert quantile_profile(empty, "v", "shard").count() == 0
    base = spark.range(100).selectExpr("cast(id as double) v")
    r = distribution_drift(base, empty.select("v"), "v").first()
    assert r.n_old == 100 and r.n_new is None and r.tv_distance is None


def test_heavy_hitters_plan_is_lazy_semi_join(spark):
    """Plan shape: recount side filters via broadcast left-semi join before
    the aggregate's exchange, and the whole operator builds without running
    a job (no driver-side action)."""
    e = load_table(spark, SF_DIR, "events")
    plan = heavy_hitters(e, "user_id", threshold_frac=0.008)._jdf.queryExecution().toString()
    assert "LeftSemi" in plan
    assert "mapInPandas" in plan or "MapInPandas" in plan


def test_relative_heavy_hitters_guard_and_null_keys(spark):
    """Review r4: (a) when the distinct-key domain exceeds the Misra–Gries
    exactness bound mean_mult*(counters+1), the plan raises instead of
    silently dropping qualifying keys; (b) null keys are excluded from n
    consistently with the candidate/recount passes, so they don't inflate
    the mean threshold."""
    from pyspark.sql import Row

    from vector_search_databricks_poc_spark.operators.sketches import (
        relative_heavy_hitters,
    )

    rows = (
        [Row(k="hot")] * 50
        + [Row(k=f"c{i}") for i in range(30)]
        + [Row(k=None)] * 120  # nulls outnumber data rows
    )
    df = spark.createDataFrame(rows)

    # non-null n=80, d=31, mean=2.58; 'hot' (50) qualifies at 1.2x mean.
    # With nulls wrongly counted, n=200 -> threshold 7.7 still passes for
    # 'hot', so assert the THRESHOLD effect: a key at 4 > 1.2*2.58=3.1
    # qualifies only under the null-excluding n.
    df4 = df.union(spark.createDataFrame([Row(k="warm")] * 4))
    got = {r.k for r in relative_heavy_hitters(df4, "k", mean_mult=1.2).collect()}
    assert "hot" in got
    assert "warm" in got  # n=84, d=32 -> mean 2.63, threshold 3.15 < 4

    import pytest as _pytest

    with _pytest.raises(Exception, match="exactness bound"):
        relative_heavy_hitters(df, "k", mean_mult=1.2, counters=8).collect()
