"""A/B the anchored prune's search-time cost (r8 verdict #3 root-cause).

r8's `_prune_keep_in` anchors each node's best in-edge through every
degree prune so near-duplicate cliques cannot strand regions unreachable
(recall fix, measured in SCALING.md).  The r8 bench then showed
`graph_batch_search` 4.039s -> 4.559s on a ~1.8x faster host; hypothesis:
the anchored graph is better connected, so beams visit and exact-score
more neighbors per hop — a recall-for-time trade, not a plan regression.

This script builds the SAME sf0.1 graph twice — anchored (shipping code)
and score-only pruned (pre-r8 behavior, via monkeypatching
`_prune_keep_in` back to `_top_deg`) — and for each measures:
  - best-of-3 batch_search wall time (16 queries, k=10, ef=48, nprobe=4,
    the bench shape),
  - zero-in-degree node count (the stranding the anchor removes),
  - recall@10 of the beam vs brute-force exact.

Run solo (no concurrent Spark jobs): `python scripts/graph_anchor_ab.py`.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.session import get_spark
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators import graph_ann as G
from vector_search_databricks_poc_spark.operators.similarity_join import (
    brute_force_topk_join,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def measure(spark, e, queries, anchored: bool) -> dict:
    orig = G._prune_keep_in
    if not anchored:
        G._prune_keep_in = lambda edges, deg: G._top_deg(edges, deg)
    try:
        path = tempfile.mkdtemp(prefix=f"anchor_ab_{anchored}_") + "/graph"
        t0 = time.time()
        idx = G.build_graph_index(e, path, deg=8, k_centroids=8)
        build_s = time.time() - t0
    finally:
        G._prune_keep_in = orig

    edges = spark.read.parquet(path)
    n_nodes = e.count()
    n_zero_in = n_nodes - edges.select(
        F.explode("neighbors").alias("nb")
    ).select(F.col("nb.nbr_id")).distinct().count()

    best = None
    for _ in range(3):
        t0 = time.time()
        hits = idx.batch_search(spark, queries, k=10, ef=48, nprobe=4)
        n = hits.count()
        el = time.time() - t0
        best = el if best is None else min(best, el)

    got = {
        (r["query_id"], r["vec_id"])
        for r in idx.batch_search(spark, queries, k=10, ef=48, nprobe=4).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk_join(queries, e, k=10).collect()
    }
    recall = len(got & exact) / len(exact)
    return {
        "anchored": anchored,
        "build_s": round(build_s, 2),
        "search_best_of_3_s": round(best, 3),
        "hits": n,
        "zero_in_degree": n_zero_in,
        "recall_at_10": round(recall, 4),
    }


def main() -> None:
    spark = get_spark(app_name="graph_anchor_ab")
    spark.sparkContext.setLogLevel("ERROR")
    e = load_table(spark, SF_DIR, "embeddings")
    queries = e.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
    )
    out = [measure(spark, e, queries, anchored)
           for anchored in (False, True)]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
