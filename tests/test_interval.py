"""Bucketed range join correctness vs naive range join; skew diagnosis."""

from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.interval import (
    bucketed_range_join,
    diagnose_skew,
)


def test_bucketed_range_join_equals_naive(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    iv = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("user_id"),
            (F.lit("2024-01-01").cast("timestamp_ntz")
             + F.make_interval(hours=(F.col("o_orderkey") % 48).cast("int"))).alias("s"),
            (F.lit("2024-01-01").cast("timestamp_ntz")
             + F.make_interval(hours=(F.col("o_orderkey") % 48 + 5).cast("int"))).alias("e"),
        )
    )
    fast = bucketed_range_join(ev, iv, "ts", "s", "e", bucket="3 hours", extra_equi="user_id")
    naive = ev.join(
        iv,
        on=[
            ev["user_id"] == iv["user_id"],
            ev["ts"].cast("timestamp_ntz") >= iv["s"],
            ev["ts"].cast("timestamp_ntz") < iv["e"],
        ],
    )
    assert fast.count() == naive.count()
    a = {(r["event_id"], r["o_orderkey"]) for r in fast.select("event_id", "o_orderkey").collect()}
    b = {(r["event_id"], r["o_orderkey"]) for r in naive.select("event_id", "o_orderkey").collect()}
    assert a == b


def test_bucketed_range_join_is_equi_join(spark, sf_dir):
    """The whole point: no BroadcastNestedLoopJoin in the plan."""
    from vector_search_databricks_poc_spark.plans.audit import plan_string

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    iv = load_table(spark, sf_dir, "orders").limit(50).select(
        "o_orderkey",
        F.lit("2024-01-01").cast("timestamp_ntz").alias("s"),
        F.lit("2024-01-02").cast("timestamp_ntz").alias("e"),
    )
    fast = bucketed_range_join(ev, iv, "ts", "s", "e", bucket="1 day")
    assert "BroadcastNestedLoopJoin" not in plan_string(fast, "simple")


def test_diagnose_skew(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    top = diagnose_skew(ev, "user_id", top=5).collect()
    assert len(top) == 5
    assert all(0 < r["share"] <= 1.0 for r in top)
    shares = [r["n_rows"] for r in top]
    assert shares == sorted(shares, reverse=True)
