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


def test_sum_partials_plan_is_hash_agg_single_scan(spark, tmp_path):
    # the reduce must be a plain partial+final hash aggregate (no
    # collect_list — the unbounded single-buffer shape this replaces)
    # AND read its source exactly once: Spark does not deduplicate
    # identical subtrees across union branches, so the old
    # one-union-branch-per-column shape re-ran the upstream scan (and
    # the pandas partials feeding the fits) per column (ADVICE r8)
    from vector_search_databricks_poc_spark.operators._reduce import _stacked

    path = str(tmp_path / "parts")
    spark.createDataFrame(
        [(3, [1.0, 2.0], [10.0, 0.0]), (2, [0.5, -1.0], [1.0, 2.0])],
        "n long, s array<double>, g array<double>",
    ).write.parquet(path)
    parts = spark.read.parquet(path)
    plan = (
        _stacked(parts, ["s", "g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "collect_list" not in plan
    assert "HashAggregate" in plan
    assert plan.count("Scan parquet") == 1, plan


def test_sum_partials_null_partials_ignored(spark):
    # a NULL partial row contributes nothing to its column (and must not
    # null out the concat fan-out for the row's other columns)
    parts = spark.createDataFrame(
        [(3, None, [10.0, 0.0]), (2, [0.5, -1.0], None)],
        "n long, s array<double>, g array<double>",
    )
    n, sums = sum_partials(parts, ["s", "g"])
    assert n == 5
    assert sums["s"] == [0.5, -1.0]
    assert sums["g"] == [10.0, 0.0]


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
