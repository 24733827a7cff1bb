"""Stream-stream interval join (streaming/joins.py): DuckDB oracle for the
batch twin, bounded-state streaming run through a file source + memory sink,
and batch/stream equivalence of the final attribution report."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection
from vector_search_databricks_poc_spark import queries_registry as R
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.streaming.joins import (
    attribution_report,
    interval_join,
    stream_interval_join,
)

ATTRIBUTION_SQL = """
WITH p AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events WHERE event_type = 'purchase'),
t AS (SELECT user_id, ts::TIMESTAMP AS ts, event_type FROM events
      WHERE event_type IN ('click', 'signup', 'view'))
SELECT t.event_type AS trigger_type, COUNT(*) AS n_attributed,
       ROUND(AVG(epoch(p.ts) - epoch(t.ts)), 3) AS avg_latency_s
FROM p JOIN t ON p.user_id = t.user_id
 AND t.ts <= p.ts AND t.ts >= p.ts - INTERVAL 1 HOUR
GROUP BY trigger_type ORDER BY trigger_type
"""


def test_event_attribution_oracle(spark):
    con = duck_connection(SF_DIR)
    try:
        res = compare(R.QUERIES["event_attribution"](spark, SF_DIR), con, ATTRIBUTION_SQL)
        assert res["rows_match"] and res["cols_match"] and res["values_match"], res
    finally:
        con.close()


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """The same interval join run as a watermarked stream-stream join over
    the fixture events (fed in one availableNow pass) produces exactly the
    batch twin's pairs."""
    ev = load_table(spark, SF_DIR, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    triggers = ev.where(F.col("event_type").isin("click", "signup")).select(
        "user_id", "ts", "event_type"
    )
    batch = interval_join(purchases, triggers, key="user_id", upper="1 hour")

    # stage both sides as parquet dirs for file-source streams
    psrc, tsrc = str(tmp_path / "p"), str(tmp_path / "t")
    purchases.write.parquet(psrc)
    triggers.write.parquet(tsrc)
    ps = spark.readStream.schema(purchases.schema).parquet(psrc)
    ts = spark.readStream.schema(triggers.schema).parquet(tsrc)
    joined = stream_interval_join(
        ps, ts, key="user_id", upper="1 hour", watermark="10 minutes"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ssjoin_sink")
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch.select(*got.columns)).count() == 0


def test_stream_join_requires_bounded_condition(spark, tmp_path):
    """Sanity: the streaming join plan is accepted by the engine (watermark
    + two-sided time bound) — the unbounded variant would raise."""
    ev = load_table(spark, SF_DIR, "events").limit(10)
    src = str(tmp_path / "ev")
    ev.select("user_id", "ts").write.parquet(src)
    s1 = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    s2 = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    joined = stream_interval_join(s1, s2, key="user_id", upper="30 minutes")
    q = (
        joined.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert q.exception() is None


def test_attribution_report_shape(spark):
    ev = load_table(spark, SF_DIR, "events")
    p = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    t = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_type")
    rep = attribution_report(interval_join(p, t, key="user_id")).collect()
    assert len(rep) == 1 and rep[0].trigger_type == "click"
    assert rep[0].n_attributed > 0 and rep[0].avg_latency_s >= 0


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """The stateful streaming funnel tracker, fed the fixture events in one
    availableNow replay, reaches exactly the batch operator's per-user
    depth (earliest-completion semantics under in-order delivery)."""
    from vector_search_databricks_poc_spark.operators.funnel import funnel_user_times
    from vector_search_databricks_poc_spark.streaming.stateful import (
        streaming_funnel_depth,
    )

    steps = ["view", "click", "purchase"]
    ev = load_table(spark, SF_DIR, "events").select("user_id", "event_type", "ts")
    bt = funnel_user_times(ev, steps)
    batch_depth = {
        r["user_id"]: sum(r[f"t{i}"] is not None for i in range(1, len(steps) + 1))
        for r in bt.collect()
    }

    src = str(tmp_path / "ev")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        streaming_funnel_depth(stream, steps)
        .writeStream.format("memory")
        .queryName("funnel_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: r["d"]
        for r in spark.sql(
            "SELECT user_id, MAX(depth) AS d FROM funnel_sink GROUP BY user_id"
        ).collect()
    }
    # users with no step-1 event never appear in the batch result; the
    # stream emits them with depth 0 — align on the batch's key set
    assert {u: d for u, d in got.items() if d > 0} == {
        u: d for u, d in batch_depth.items() if d > 0
    }
    assert all(d in (0, 1, 2, 3) for d in got.values())


def test_streaming_funnel_out_of_order_within_batch(spark, tmp_path):
    """Within one micro-batch the tracker uses min-qualifying timestamps,
    so shuffled row order inside the batch cannot change the result."""
    from vector_search_databricks_poc_spark.streaming.stateful import (
        streaming_funnel_depth,
    )

    rows = [
        (1, "purchase", "2024-01-01 03:00:00"),
        (1, "view", "2024-01-01 01:00:00"),
        (1, "click", "2024-01-01 02:00:00"),
        (2, "click", "2024-01-01 01:00:00"),  # click before any view
        (2, "view", "2024-01-01 02:00:00"),
    ]
    ev = (
        spark.createDataFrame(rows, ["user_id", "event_type", "ts_s"])
        .select("user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))
    )
    src = str(tmp_path / "ooo")
    ev.write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        streaming_funnel_depth(stream, ["view", "click", "purchase"])
        .writeStream.format("memory")
        .queryName("funnel_ooo_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: r["d"]
        for r in spark.sql(
            "SELECT user_id, MAX(depth) AS d FROM funnel_ooo_sink GROUP BY user_id"
        ).collect()
    }
    assert got == {1: 3, 2: 1}


def test_streaming_funnel_across_micro_batches(spark, tmp_path):
    """ADVICE r3 (medium): a user advancing across micro-batches emits one
    update-mode row per batch at increasing depths.  Feed each funnel step
    from its own file with maxFilesPerTrigger=1 (guaranteed multi-batch
    replay), then check that the per-user-MAX aggregation the registry
    query uses recovers the true depth distribution — and that the sink
    really did record intermediate depths (i.e. the scenario is exercised,
    not vacuously passed)."""
    from vector_search_databricks_poc_spark.streaming.stateful import (
        streaming_funnel_depth,
    )

    # user 1 completes all three steps, one step per micro-batch;
    # user 2 stops after view; user 3 clicks without viewing (depth 0)
    batches = [
        [(1, "view", "2024-01-01 01:00:00"), (2, "view", "2024-01-01 01:05:00"),
         (3, "click", "2024-01-01 01:10:00")],
        [(1, "click", "2024-01-01 02:00:00")],
        [(1, "purchase", "2024-01-01 03:00:00")],
    ]
    src = tmp_path / "mb"
    src.mkdir()
    schema = None
    for i, rows in enumerate(batches):
        df = (
            spark.createDataFrame(rows, ["user_id", "event_type", "ts_s"])
            .select(
                "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts")
            )
            .coalesce(1)
        )
        df.write.parquet(str(src / f"b{i}"))
        schema = df.schema
    # one directory of single-file subdirs -> flatten: move part files up
    import glob
    import shutil

    import os as _os

    for i in range(len(batches)):
        part = glob.glob(str(src / f"b{i}" / "part-*.parquet"))[0]
        dest = str(src / f"{i:03d}.parquet")
        shutil.move(part, dest)
        # the file source orders batches by modification time — pin
        # strictly increasing mtimes so replay order = step order
        _os.utime(dest, (1700000000 + i, 1700000000 + i))
        shutil.rmtree(str(src / f"b{i}"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        streaming_funnel_depth(stream, ["view", "click", "purchase"])
        .writeStream.format("memory")
        .queryName("funnel_mb_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    raw = spark.sql(
        "SELECT user_id, depth FROM funnel_mb_sink"
    ).collect()
    depths_seen = {}
    for r in raw:
        depths_seen.setdefault(r["user_id"], set()).add(r["depth"])
    # the multi-batch scenario really happened: user 1 was emitted at
    # several intermediate depths across micro-batches
    assert len(depths_seen[1]) >= 2, depths_seen

    # registry aggregation (per-user MAX first) recovers the truth ...
    dist = {
        r["depth"]: r["n_users"]
        for r in spark.sql(
            "SELECT depth, COUNT(*) AS n_users FROM ("
            "  SELECT user_id, MAX(depth) AS depth FROM funnel_mb_sink"
            "  GROUP BY user_id"
            ") GROUP BY depth"
        ).collect()
    }
    assert dist == {3: 1, 1: 1, 0: 1}, dist

    # ... while the naive COUNT(DISTINCT user_id) GROUP BY depth —
    # the pre-fix registry shape — overcounts user 1 at stale depths
    naive = {
        r["depth"]: r["n"]
        for r in spark.sql(
            "SELECT depth, COUNT(DISTINCT user_id) AS n FROM funnel_mb_sink"
            " GROUP BY depth"
        ).collect()
    }
    assert sum(naive.values()) > sum(dist.values()), (naive, dist)
