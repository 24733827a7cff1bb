"""The parallel partial-sum reduce behind the fit operators.

ADVICE r7 (medium): the old collect_list + F.aggregate merge folded every
per-batch partial in ONE reducer's agg buffer.  The replacement
(operators/_reduce.py) explodes to (column, index, value) and lets a hash
aggregate SUM per index — map-side combine, fully parallel final merge.
These tests pin the contract the fits rely on.
"""

import pyspark.sql.functions as F
import pytest

from vector_search_databricks_poc_spark.operators._reduce import sum_partials


def test_sum_partials_matches_manual(spark):
    parts = spark.createDataFrame(
        [
            (3, [1.0, 2.0], [10.0, 0.0, 0.0, 10.0]),
            (2, [0.5, -1.0], [1.0, 2.0, 3.0, 4.0]),
            (5, [4.0, 4.0], [0.0, 1.0, 1.0, 0.0]),
        ],
        "n long, s array<double>, g array<double>",
    ).repartition(4)
    n, sums = sum_partials(parts, ["s", "g"])
    assert n == 10
    assert sums["s"] == [5.5, 5.0]
    assert sums["g"] == [11.0, 3.0, 4.0, 14.0]


def test_sum_partials_empty_frame(spark):
    parts = spark.createDataFrame([], "n long, s array<double>")
    n, sums = sum_partials(parts, ["s"])
    assert n == 0
    assert sums["s"] == []


def test_sum_partials_plan_is_hash_agg_no_collect_list(spark):
    # the reduce must be a plain partial+final hash aggregate: no
    # collect_list (the unbounded single-buffer shape this replaces)
    parts = spark.createDataFrame(
        [(1, [1.0])], "n long, s array<double>"
    )
    stacked = parts.select(
        F.lit(0).alias("_c"), F.posexplode("s").alias("_i", "_x")
    ).unionAll(
        parts.select(
            F.lit(-1).alias("_c"), F.lit(0).alias("_i"),
            F.col("n").cast("double").alias("_x"),
        )
    )
    plan = (
        stacked.groupBy("_c", "_i")
        .agg(F.sum("_x").alias("_x"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "collect_list" not in plan
    assert "HashAggregate" in plan


def test_fit_pca_invariant_to_partitioning(spark):
    # same statistics whatever the partitioning (the reduce is associative)
    from vector_search_databricks_poc_spark.operators.pca import fit_pca

    rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(6)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m1 = fit_pca(emb.coalesce(1), k=3)
    m2 = fit_pca(emb.repartition(16), k=3)
    assert m1.mean == pytest.approx(m2.mean, abs=1e-9)
    for r1, r2 in zip(m1.components, m2.components):
        assert r1 == pytest.approx(r2, abs=1e-9)
