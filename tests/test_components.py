"""Connected components / dedup clustering."""

import pytest

from vector_search_databricks_poc_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def test_two_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # a 20-node chain needs ~log-diameter rounds of min propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 120)], "id_a long, id_b long"
    )
    out = connected_components(edges).collect()
    assert {r["component"] for r in out} == {100}
    assert len(out) == 21


def test_convergence_guard(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(50)], "id_a long, id_b long")
    with pytest.raises(RuntimeError):
        connected_components(edges, max_iter=1)


def test_dedup_clusters_representative(spark):
    df = spark.createDataFrame(
        [(i, f"text{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    out = {r["doc_id"]: r["representative"] for r in dedup_clusters(df, pairs, "doc_id").collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0}
