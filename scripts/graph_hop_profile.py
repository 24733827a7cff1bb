"""Per-hop cost breakdown of GraphIndex.batch_search (guide §1: measure
first).  Replicates the hop loop's fetch with timers around each moving
part so the fixed per-hop overhead (createDataFrame, Catalyst
analysis+planning, job execution + Arrow collect) is split out from the
per-invocation costs (qn checkpoint, seed collect, output window).

Usage: python3 scripts/graph_hop_profile.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark import queries_registry as R
from vector_search_databricks_poc_spark import vectors as V
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators import graph_ann
from vector_search_databricks_poc_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def main() -> None:
    spark = get_spark(app_name="graph_hop_profile")
    spark.sparkContext.setLogLevel("ERROR")

    e = load_table(spark, SF_DIR, "embeddings")
    idx = R._cached_index(
        "graph", SF_DIR,
        lambda: graph_ann.build_graph_index(
            e, f"{R._scratch_dir('graph_search_')}/graph", deg=8, k_centroids=8
        ),
    )
    q = e.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
    )

    # warm up (build caches, codegen, fs footers)
    idx.batch_search(spark, q, k=10, ef=48, nprobe=4).count()

    k, ef, nprobe, max_hops = 10, 48, 4, 8
    k_c = len(idx.centroids)
    idc = F.col(idx.id_col)

    for rep in range(2):
        t_start = time.time()
        qn = q.where(F.col("query_vec").isNotNull()).select(
            F.col("query_id").alias("_qid"),
            V.l2_normalize(F.col("query_vec").cast("array<double>")).alias("_qv"),
        ).localCheckpoint(eager=True)
        t_qn = time.time()

        ranked_cents = F.array_sort(
            F.zip_with(
                graph_ann._centroid_dists("_qv", idx.centroids),
                F.sequence(F.lit(0), F.lit(k_c - 1)),
                lambda d, i: F.struct(d.alias("d"), i.alias("i")),
            )
        )
        probe_arr = F.transform(F.slice(ranked_cents, 1, nprobe), lambda s: s["i"])
        ecs = sorted(idx.entries)
        entry_map = F.map_from_arrays(
            F.array(*[F.lit(int(c)).cast("int") for c in ecs]),
            F.array(*[F.lit(int(idx.entries[c])).cast("long") for c in ecs]),
        )
        seeds = (
            qn.select("_qid", F.explode(probe_arr).alias("_cent"))
            .select(
                "_qid",
                F.element_at(entry_map, F.col("_cent").cast("int")).alias("_cand"),
                "_cent",
            )
            .where(F.col("_cand").isNotNull())
            .distinct()
        )
        seed_rows = [(r["_qid"], r["_cand"], r["_cent"]) for r in seeds.collect()]
        t_seeds = time.time()
        print(f"rep {rep}: qn checkpoint {t_qn-t_start:.3f}s, seeds collect "
              f"{t_seeds-t_qn:.3f}s ({len(seed_rows)} seeds)")

        scan = spark.read.parquet(idx.path)

        def fetch(pair_rows):
            t0 = time.time()
            parts = sorted({c for _, _, c in pair_rows})
            pairs = spark.createDataFrame(
                pd.DataFrame(pair_rows, columns=["_qid", "_cand", "_cent"]),
                "_qid long, _cand long, _cent int",
            )
            rows = (
                scan.where(F.col("centroid_id").isin(parts))
                .join(
                    F.broadcast(
                        pairs.select("_qid", F.col("_cand").alias(idx.id_col))
                    ),
                    idx.id_col,
                )
                .select("_qid", idc, "neighbors", F.col(idx.vec_col).alias("_v"))
            )
            final = (
                rows.join(F.broadcast(qn), "_qid")
                .select(
                    "_qid",
                    idc,
                    V.dot("_v", "_qv").alias("_score"),
                    F.transform("neighbors", lambda s: s["nbr_id"]).alias("_nids"),
                    F.transform("neighbors", lambda s: s["nbr_centroid"]).alias(
                        "_ncents"
                    ),
                )
            )
            t1 = time.time()
            final.schema  # force analysis
            t2 = time.time()
            final._jdf.queryExecution().executedPlan()  # optimize + plan
            t3 = time.time()
            out = final.toPandas()
            t4 = time.time()
            print(
                f"  hop: n_pairs={len(pair_rows):5d} build={t1-t0:.3f} "
                f"analyze={t2-t1:.3f} plan={t3-t2:.3f} exec={t4-t3:.3f} "
                f"total={t4-t0:.3f}"
            )
            return out

        beams, expanded, seen, nbrs_of = {}, {}, {}, {}
        pending = seed_rows
        for qid, cand, cent in pending:
            seen.setdefault(qid, set()).add(cand)
        n_hops = 0
        for _ in range(max_hops + 1):
            if not pending:
                break
            fetched = fetch(pending)
            n_hops += 1
            for qid, nid, score, nids, ncents in zip(
                fetched["_qid"], fetched[idx.id_col], fetched["_score"],
                fetched["_nids"], fetched["_ncents"],
            ):
                beams.setdefault(int(qid), []).append((float(score), int(nid)))
                if nid not in nbrs_of:
                    nbrs_of[int(nid)] = list(
                        zip((int(x) for x in nids), (int(x) for x in ncents))
                    )
            pending = []
            for qid, rows_ in beams.items():
                rows_.sort(key=lambda t: (-t[0], t[1]))
                exp = expanded.setdefault(qid, set())
                sn = seen[qid]
                for fp, nid in rows_[: ef]:
                    if nid in exp:
                        continue
                    exp.add(nid)
                    for nb, nc in nbrs_of.get(nid, ()):
                        if nb not in sn:
                            sn.add(nb)
                            pending.append((qid, nb, nc))
        t_hops = time.time()
        print(f"rep {rep}: {n_hops} hops in {t_hops-t_seeds:.3f}s, "
              f"total {t_hops-t_start:.3f}s")


if __name__ == "__main__":
    main()
