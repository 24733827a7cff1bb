"""PageRank: hand-checked goldens, invariants, and a pure-Python reference.

The DuckDB unrolled-iteration compare for the declared query lives in
test_rows_only_compares.py; here the operator itself is pinned on small
graphs where the fixpoint is known in closed form or computable by a
10-line reference implementation.
"""

from __future__ import annotations

import pytest

from vector_search_databricks_poc_spark.operators.linkrank import (
    centrality_keepers,
    pagerank,
    undirected_pagerank,
)


def _ref_pagerank(edges, damping, iters, handle_dangling=True):
    """Reference power iteration matching pagerank()'s update exactly."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    out = {}
    for a, b in set(edges):
        out.setdefault(a, set()).add(b)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        inflow = {v: 0.0 for v in nodes}
        dang = 0.0
        for v in nodes:
            if v in out:
                share = rank[v] / len(out[v])
                for w in out[v]:
                    inflow[w] += share
            else:
                dang += rank[v]
        if not handle_dangling:
            dang = 0.0
        rank = {
            v: (1 - damping) / n + damping * (inflow[v] + dang / n) for v in nodes
        }
    return rank


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_two_node_cycle_is_uniform(spark):
    got = _run(spark, [(1, 2), (2, 1)], iters=6)
    assert got[1] == pytest.approx(0.5, abs=1e-12)
    assert got[2] == pytest.approx(0.5, abs=1e-12)


def test_matches_reference_with_dangling(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 1)]  # 4 is dangling
    got = _run(spark, edges, iters=7)
    want = _ref_pagerank(edges, 0.85, 7)
    for v, r in want.items():
        assert got[v] == pytest.approx(r, abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_dangling_off_drops_mass(spark):
    edges = [(1, 2), (2, 3)]  # 3 dangles
    got = _run(spark, edges, iters=5, handle_dangling=False)
    want = _ref_pagerank(edges, 0.85, 5, handle_dangling=False)
    for v, r in want.items():
        assert got[v] == pytest.approx(r, abs=1e-9), v
    assert sum(got.values()) < 1.0


def test_undirected_star_center_ranks_highest(spark):
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4)], ["id_a", "id_b"]
    )
    got = {r["node"]: r["rank"] for r in undirected_pagerank(pairs, iters=10).collect()}
    assert got[0] > max(got[i] for i in (1, 2, 3, 4))
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_centrality_keepers_picks_hub(spark):
    # two components: a star (hub 0) and an edge (3 < 7 tie-break on id
    # only if ranks tie; here symmetric pair ranks ARE equal -> min id)
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (3, 7)], ["id_a", "id_b"]
    )
    rows = {r["node"]: r for r in centrality_keepers(pairs, iters=8).collect()}
    assert rows[0]["is_keeper"] and not rows[1]["is_keeper"] and not rows[2]["is_keeper"]
    assert rows[0]["component"] == 0
    assert rows[3]["is_keeper"] and not rows[7]["is_keeper"]  # equal rank, min id
