"""Streaming materialized-view sync: stream state == batch recompute.

Contract mirrored from the index change-log replay tests: after the
stream drains a change feed, the persisted view must equal
``group_agg`` over the current base — across waves, modes, and replays.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.operators.matview import group_agg
from vector_search_databricks_poc_spark.streaming.agg_view_sync import (
    init_agg_view,
    read_agg_view,
    stream_agg_view_sync,
)

MEASURES = {"n": ("count", "rid"), "total": ("sum", "v")}
MEASURES_MM = {"n": ("count", "rid"), "total": ("sum", "v"),
               "lo": ("min", "v"), "hi": ("max", "v")}


def _rows(spark, rows):
    return spark.createDataFrame(rows, "rid long, g string, v long")


def _write_log(spark, log_path, entries, batch_seq):
    spark.createDataFrame(
        [(rid, op, batch_seq) for rid, op in entries],
        "rid long, op string, batch_seq long",
    ).withColumn("ts", F.current_timestamp()).write.mode("append").parquet(log_path)


def _drain(base, view_dir, log_path, ckpt, measures, mode):
    q = stream_agg_view_sync(
        base, view_dir, log_path, keys=["g"], measures=measures,
        id_col="rid", mode=mode, checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


V0 = [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "c", 100)]
# wave 1: update 2, delete 4 (c empties), insert 5 (d born)
V1 = [(1, "a", 10), (2, "a", 25), (3, "b", 5), (5, "d", 7)]
W1 = [(2, "update"), (4, "delete"), (5, "insert")]
# wave 2: delete 1, update 5, insert 6 into b
V2 = [(2, "a", 25), (3, "b", 5), (5, "d", 9), (6, "b", 2)]
W2 = [(1, "delete"), (5, "update"), (6, "insert")]


@pytest.mark.parametrize("mode,measures", [
    ("delta", MEASURES),
    ("recount_groups", MEASURES_MM),
])
def test_stream_view_tracks_batch_across_waves(spark, tmp_path, mode, measures):
    view, log, ckpt = (str(tmp_path / n) for n in ("view", "log", "ckpt"))
    init_agg_view(spark, view, _rows(spark, V0), ["g"], measures, "rid")
    assert _sorted(read_agg_view(spark, view)) == _sorted(
        group_agg(_rows(spark, V0), ["g"], measures)
    )

    _write_log(spark, log, W1, batch_seq=1)
    _drain(_rows(spark, V1), view, log, ckpt, measures, mode)
    assert _sorted(read_agg_view(spark, view)) == _sorted(
        group_agg(_rows(spark, V1), ["g"], measures)
    )

    _write_log(spark, log, W2, batch_seq=2)
    _drain(_rows(spark, V2), view, log, ckpt, measures, mode)
    assert _sorted(read_agg_view(spark, view)) == _sorted(
        group_agg(_rows(spark, V2), ["g"], measures)
    )


def test_replay_same_checkpoint_is_noop(spark, tmp_path):
    view, log, ckpt = (str(tmp_path / n) for n in ("view", "log", "ckpt"))
    init_agg_view(spark, view, _rows(spark, V0), ["g"], MEASURES, "rid")
    _write_log(spark, log, W1, batch_seq=1)
    _drain(_rows(spark, V1), view, log, ckpt, MEASURES, "delta")
    before = _sorted(read_agg_view(spark, view))
    # drain again with the same checkpoint: committed batches never re-run
    _drain(_rows(spark, V1), view, log, ckpt, MEASURES, "delta")
    assert _sorted(read_agg_view(spark, view)) == before


def test_fresh_checkpoint_full_replay_converges(spark, tmp_path):
    """Replaying the WHOLE drained log under a fresh checkpoint must
    leave the view unchanged: the marker blocks state double-apply and
    the store rewrite is idempotent."""
    view, log = str(tmp_path / "view"), str(tmp_path / "log")
    init_agg_view(spark, view, _rows(spark, V0), ["g"], MEASURES, "rid")
    _write_log(spark, log, W1, batch_seq=1)
    _drain(_rows(spark, V1), view, log, str(tmp_path / "c1"), MEASURES, "delta")
    want = _sorted(group_agg(_rows(spark, V1), ["g"], MEASURES))
    assert _sorted(read_agg_view(spark, view)) == want
    _drain(_rows(spark, V1), view, log, str(tmp_path / "c2"), MEASURES, "delta")
    assert _sorted(read_agg_view(spark, view)) == want


def test_delete_only_batch_and_empty_log(spark, tmp_path):
    view, log, ckpt = (str(tmp_path / n) for n in ("view", "log", "ckpt"))
    init_agg_view(spark, view, _rows(spark, V0), ["g"], MEASURES, "rid")
    # delete-only wave: every 'a' row goes away
    v1 = [(3, "b", 5), (4, "c", 100)]
    _write_log(spark, log, [(1, "delete"), (2, "delete")], batch_seq=1)
    _drain(_rows(spark, v1), view, log, ckpt, MEASURES, "delta")
    got = {r["g"]: (r["n"], r["total"]) for r in read_agg_view(spark, view).collect()}
    assert "a" not in got and got["b"] == (1, 5) and got["c"] == (1, 100)


def test_stream_view_null_sums_stay_null(spark, tmp_path):
    """ADVICE r7 follow-through on the streaming twin: a view bootstrapped
    with null_counts=True keeps SQL NULL sums (all-NULL groups stay NULL,
    including untouched ones) through stream batches."""
    view, log, ckpt = (str(tmp_path / n) for n in ("view", "log", "ckpt"))
    n0 = [(1, "a", None), (2, "a", None), (3, "b", 9), (4, "c", None)]
    # delete 3's value row (b goes all-NULL... actually b empties), update
    # 1 to a real value (a gains its first non-null), c untouched all-NULL
    n1 = [(1, "a", 42), (2, "a", None), (4, "c", None)]
    w1 = [(1, "update"), (3, "delete")]
    init_agg_view(
        spark, view, _rows(spark, n0), ["g"], MEASURES, "rid",
        null_counts=True,
    )
    boot = {r["g"]: r["total"] for r in read_agg_view(spark, view).collect()}
    assert boot["a"] is None and boot["c"] is None and boot["b"] == 9

    _write_log(spark, log, w1, batch_seq=1)
    _drain(_rows(spark, n1), view, log, ckpt, MEASURES, "delta")
    got = _sorted(read_agg_view(spark, view))
    want = _sorted(group_agg(_rows(spark, n1), ["g"], MEASURES, null_counts=True))
    assert got == want
    by_g = {r["g"]: r["total"] for r in read_agg_view(spark, view).collect()}
    assert by_g["a"] == 42 and by_g["c"] is None and "b" not in by_g
