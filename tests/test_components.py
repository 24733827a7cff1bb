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


def test_quality_keepers_small(spark):
    """Hand-sized graph: the best-quality member of each cluster keeps,
    min id breaks score ties, singletons keep themselves."""
    from vector_search_databricks_poc_spark.operators.components import (
        quality_dedup_keepers,
    )

    df = spark.createDataFrame(
        [(0, 5.0), (1, 9.0), (2, 9.0), (3, 7.0), (4, 1.0)],
        "doc_id long, quality double",
    )
    # cluster {0,1,2} (1 and 2 tie at 9.0 -> 1 keeps), cluster {3}, {4}
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    out = {r["doc_id"]: (r["representative"], r["is_keeper"])
           for r in quality_dedup_keepers(df, pairs, "doc_id", "quality").collect()}
    assert out == {0: (0, False), 1: (0, True), 2: (0, False),
                   3: (3, True), 4: (4, True)}


def test_quality_dedup_keepers_query_oracle(spark):
    """Full DuckDB re-derivation of the registry query: recursive closure
    for the cluster labels, window for the per-cluster quality keeper."""
    from tests.conftest import SF_DIR
    from tests.oracle_utils import compare, duck_connection
    from vector_search_databricks_poc_spark import queries_registry as R

    con = duck_connection(SF_DIR)
    try:
        sql = f"""
        WITH RECURSIVE edges AS ({R._NEAR_DUP_EDGES_SQL}),
        sym AS (SELECT id_a AS a, id_b AS b FROM edges
                UNION SELECT id_b, id_a FROM edges),
        reach(a, b) AS (
          SELECT a, b FROM sym
          UNION
          SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
        ),
        comp AS (SELECT a AS node, LEAST(a, MIN(b)) AS component
                 FROM reach GROUP BY a),
        lab AS (
          SELECT d.doc_id, LENGTH(d.text) AS quality,
                 COALESCE(c.component, d.doc_id) AS representative
          FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        )
        SELECT doc_id, quality, representative,
               ROW_NUMBER() OVER (
                 PARTITION BY representative ORDER BY quality DESC, doc_id
               ) = 1 AS is_keeper
        FROM lab
        """
        res = compare(R.QUERIES["quality_dedup_keepers"](spark, SF_DIR), con, sql)
        assert res["rows_match"] and res["cols_match"] and res["values_match"], res
    finally:
        con.close()
