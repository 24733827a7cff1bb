"""Incremental aggregate maintenance: refresh == full recompute, always.

The contract is exact equality with ``group_agg(new)`` for any
insert/update/delete mix, in both modes, including groups that empty out
and groups born in the batch; plus the plan-side promise that the
snapshots are only read semi-join-pruned.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.diff import snapshot_diff
from vector_search_databricks_poc_spark.operators.matview import (
    group_agg,
    incremental_agg_refresh,
)
from vector_search_databricks_poc_spark.plans import audit

MEASURES_DELTA = {
    "n": ("count", "rid"),
    "total": ("sum", "v"),
}
MEASURES_FULL = {
    "n": ("count", "rid"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _snap(spark, rows):
    return spark.createDataFrame(rows, "rid long, g string, v long")


OLD = [
    (1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "b", 7), (5, "c", 100),
]
# update 2 (a: 20->25), delete 5 (c empties out), delete 3, insert 6 (d born),
# insert 7 into b
NEW = [
    (1, "a", 10), (2, "a", 25), (4, "b", 7), (6, "d", 1), (7, "b", 3),
]


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("mode,measures", [
    ("recount_groups", MEASURES_FULL),
    ("delta", MEASURES_DELTA),
])
def test_refresh_equals_full_recompute(spark, mode, measures):
    old, new = _snap(spark, OLD), _snap(spark, NEW)
    state = group_agg(old, ["g"], measures)
    diff = snapshot_diff(old, new, id_col="rid")
    got = incremental_agg_refresh(
        state, old, new, diff, keys=["g"], measures=measures,
        id_col="rid", mode=mode,
    )
    want = group_agg(new, ["g"], measures)
    assert _sorted(got) == _sorted(want)
    gs = {r["g"] for r in got.collect()}
    assert "c" not in gs and "d" in gs  # emptied group dropped, new born


def test_empty_diff_is_identity(spark):
    old = _snap(spark, OLD)
    state = group_agg(old, ["g"], MEASURES_FULL)
    diff = snapshot_diff(old, old, id_col="rid")
    got = incremental_agg_refresh(
        state, old, old, diff, keys=["g"], measures=MEASURES_FULL, id_col="rid"
    )
    assert _sorted(got) == _sorted(state)


def test_delta_mode_rejects_min_max(spark):
    old, new = _snap(spark, OLD), _snap(spark, NEW)
    state = group_agg(old, ["g"], MEASURES_FULL)
    diff = snapshot_diff(old, new, id_col="rid")
    with pytest.raises(ValueError, match="delta-maintainable"):
        incremental_agg_refresh(
            state, old, new, diff, keys=["g"], measures=MEASURES_FULL,
            id_col="rid", mode="delta",
        )


def test_count_measure_required(spark):
    old = _snap(spark, OLD)
    with pytest.raises(ValueError, match="count"):
        group_agg(old, ["g"], {"total": ("sum", "v")})


def test_snapshots_read_pruned(spark):
    """Both modes: changed-id sets broadcast, snapshots behind semi
    joins; delta mode's merge is the only non-broadcast join."""
    old, new = _snap(spark, OLD), _snap(spark, NEW)
    diff = snapshot_diff(old, new, id_col="rid")
    state = group_agg(old, ["g"], MEASURES_DELTA)
    for mode in ("recount_groups", "delta"):
        out = incremental_agg_refresh(
            state, old, new, diff, keys=["g"], measures=MEASURES_DELTA,
            id_col="rid", mode=mode,
        )
        assert audit.uses_broadcast_join(out), mode


def test_refresh_on_fixture_orders(spark):
    """Registry-scale check on the real orders table with planted churn:
    refresh == full recompute, both modes, decimal-exact money sums."""
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("rid"),
        F.col("o_orderstatus").alias("g"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    new = (
        orders.where(F.col("rid") % 13 != 0)  # deletes
        .select(
            "rid", "g",
            F.when(F.col("rid") % 7 == 0, F.col("v") + 1).otherwise(F.col("v")).alias("v"),
        )
        .unionByName(
            orders.select(
                (F.col("rid") + 10_000_000).alias("rid"), "g", "v"
            ).where(F.col("rid") % 17 == 0)  # inserts
        )
    )
    measures = {"n": ("count", "rid"), "total": ("sum", "v")}
    state = group_agg(orders, ["g"], measures)
    diff = snapshot_diff(orders, new, id_col="rid")
    want = _sorted(group_agg(new, ["g"], measures))
    for mode in ("recount_groups", "delta"):
        got = incremental_agg_refresh(
            state, orders, new, diff, keys=["g"], measures=measures,
            id_col="rid", mode=mode,
        )
        assert _sorted(got) == want, mode


@pytest.mark.parametrize("seed", range(6))
def test_random_churn_refresh_equals_recompute(spark, seed):
    """Seeded randomized churn differential: arbitrary delete/update/
    insert mixes (including groups that empty, groups born, value sign
    flips) must keep refresh == full recompute in both modes."""
    import random

    rng = random.Random(seed)
    rows = [
        (i, f"g{rng.randrange(5)}", rng.randrange(-50, 100)) for i in range(200)
    ]
    d_mod, u_mod, i_step = (
        rng.randrange(2, 7), rng.randrange(2, 7), rng.randrange(2, 7),
    )
    new_rows = [
        (i, g, v + (7 if i % u_mod == 0 else 0))
        for (i, g, v) in rows
        if i % d_mod != 0
    ]
    new_rows += [
        (1000 + i, f"g{rng.randrange(7)}", rng.randrange(-20, 100))
        for i in range(0, 200, i_step)
    ]
    old = _snap(spark, rows)
    new = _snap(spark, new_rows)
    diff = snapshot_diff(old, new, id_col="rid")
    for mode, measures in (
        ("recount_groups", MEASURES_FULL),
        ("delta", MEASURES_DELTA),
    ):
        state = group_agg(old, ["g"], measures)
        got = incremental_agg_refresh(
            state, old, new, diff, keys=["g"], measures=measures,
            id_col="rid", mode=mode,
        )
        assert _sorted(got) == _sorted(group_agg(new, ["g"], measures)), (
            seed, mode,
        )


def _snap_nullable(spark, rows):
    return spark.createDataFrame(rows, "rid long, g string, v long")


# group "a": sums stay all-NULL through the churn; group "b": becomes
# all-NULL after its only non-null row is deleted; group "c": untouched
# all-NULL state group (the ADVICE r7 regression: delta merge used to
# coalesce it to 0); group "d": gains its first non-null value.
OLD_NULLS = [
    (1, "a", None), (2, "a", None), (3, "b", 9), (4, "b", None),
    (5, "c", None), (6, "d", None),
]
NEW_NULLS = [
    (1, "a", None), (2, "a", None), (8, "a", None),  # insert another null
    (4, "b", None),                                   # delete rid 3 (the value)
    (5, "c", None),                                   # untouched
    (6, "d", None), (9, "d", 42),                     # first value born
]


@pytest.mark.parametrize("mode", ["recount_groups", "delta"])
def test_null_sum_semantics_preserved(spark, mode):
    """ADVICE r7: with a null_counts=True state, refresh == full
    recompute EXACTLY for NULL measure values too — all-NULL groups stay
    NULL (not 0), including untouched state groups, in both modes."""
    measures = {"n": ("count", "rid"), "total": ("sum", "v")}
    old, new = _snap_nullable(spark, OLD_NULLS), _snap_nullable(spark, NEW_NULLS)
    state = group_agg(old, ["g"], measures, null_counts=True)
    diff = snapshot_diff(old, new, id_col="rid")
    got = incremental_agg_refresh(
        state, old, new, diff, keys=["g"], measures=measures,
        id_col="rid", mode=mode,
    )
    want = group_agg(new, ["g"], measures, null_counts=True)
    assert _sorted(got) == _sorted(want)
    by_g = {r["g"]: r["total"] for r in got.collect()}
    assert by_g["a"] is None and by_g["b"] is None and by_g["c"] is None
    assert by_g["d"] == 42


def test_null_counts_state_chains_across_refreshes(spark):
    """The __nn columns round-trip: refresh output is itself a valid
    state for the next refresh."""
    measures = {"n": ("count", "rid"), "total": ("sum", "v")}
    s0 = _snap_nullable(spark, OLD_NULLS)
    s1 = _snap_nullable(spark, NEW_NULLS)
    s2_rows = [(1, "a", 7), (4, "b", None), (5, "c", None), (9, "d", 42)]
    s2 = _snap_nullable(spark, s2_rows)
    state = group_agg(s0, ["g"], measures, null_counts=True)
    state = incremental_agg_refresh(
        state, s0, s1, snapshot_diff(s0, s1, id_col="rid"),
        keys=["g"], measures=measures, id_col="rid", mode="delta",
    ).localCheckpoint()
    state = incremental_agg_refresh(
        state, s1, s2, snapshot_diff(s1, s2, id_col="rid"),
        keys=["g"], measures=measures, id_col="rid", mode="delta",
    )
    want = group_agg(s2, ["g"], measures, null_counts=True)
    assert _sorted(state) == _sorted(want)
    by_g = {r["g"]: r["total"] for r in state.collect()}
    assert by_g["a"] == 7 and by_g["b"] is None and by_g["c"] is None


def test_partial_nn_state_raises(spark):
    measures = {"n": ("count", "rid"), "t1": ("sum", "v"), "t2": ("sum", "v")}
    old = _snap_nullable(spark, OLD_NULLS)
    state = group_agg(old, ["g"], measures, null_counts=True).drop("t2__nn")
    with pytest.raises(ValueError, match="only some sum measures"):
        incremental_agg_refresh(
            state, old, old.limit(0), old.limit(0).select("rid"),
            keys=["g"], measures=measures, id_col="rid", mode="delta",
        )
