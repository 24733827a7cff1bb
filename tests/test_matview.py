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
