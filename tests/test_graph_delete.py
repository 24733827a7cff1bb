"""Graph-index deletes (operators/graph_ann.py::delete_from_graph):
victims vanish everywhere, FreshDiskANN-style local repair re-links the
hole, emptied partitions are dropped, entry points stay valid, and
search quality over the survivors holds.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.functions.embedding import embed_text
from vector_search_databricks_poc_spark.operators.graph_ann import (
    build_graph_index,
    delete_from_graph,
    insert_into_graph,
)
from vector_search_databricks_poc_spark.operators.topk import top_k_similar


@pytest.fixture(scope="module")
def emb(spark):
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return embed_text(d, dim=32).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    ).localCheckpoint()


def _adjacency_clean(spark, idx, deleted: set[int]) -> None:
    rows = spark.read.parquet(idx.path).collect()
    alive = {int(r["vec_id"]) for r in rows}
    assert not (alive & deleted), "victim row survived"
    cent_of = {int(r["vec_id"]): int(r["centroid_id"]) for r in rows}
    for r in rows:
        for nb in r["neighbors"]:
            assert int(nb["nbr_id"]) not in deleted, "dangling edge to victim"
            assert int(nb["nbr_id"]) in alive, "edge to nonexistent node"
            # struct names the neighbor's REAL partition (hop-prune contract)
            assert cent_of[int(nb["nbr_id"])] == int(nb["nbr_centroid"])
    # entry points reference live nodes of their own partition
    for c, e in idx.entries.items():
        assert e in alive and cent_of[e] == c


def test_delete_removes_and_repairs(spark, emb, tmp_path):
    corpus = emb.where(F.col("vec_id") < 300)
    idx = build_graph_index(
        corpus, str(tmp_path / "g"), deg=4, k_centroids=4, refine_rounds=0
    )
    before = spark.read.parquet(idx.path)
    # delete the nodes most pointed-at (maximum repair pressure)
    indeg = (
        before.select(F.explode("neighbors").alias("_nb"))
        .groupBy(F.col("_nb.nbr_id").alias("vec_id"))
        .agg(F.count("*").alias("d"))
        .orderBy(F.desc("d"), "vec_id")
        .limit(5)
        .collect()
    )
    victims = {int(r["vec_id"]) for r in indeg}
    # pointers that will need repair
    pointers_before = {
        int(r["vec_id"])
        for r in before.where(
            F.exists("neighbors", lambda s: s["nbr_id"].isin(list(victims)))
        ).collect()
        if int(r["vec_id"]) not in victims
    }
    assert pointers_before, "fixture produced no pointers — test is vacuous"

    res = delete_from_graph(spark, idx, sorted(victims))
    assert res == 5 and res.skipped == 0
    _adjacency_clean(spark, idx, victims)

    # repair actually re-linked: pointers keep their degree filled where
    # candidates existed (not silently left short)
    after = {
        int(r["vec_id"]): r["neighbors"]
        for r in spark.read.parquet(idx.path).collect()
    }
    repaired = [p for p in pointers_before if len(after[p]) == idx.deg]
    assert repaired, "no pointer kept full degree after repair"

    # a reloaded handle agrees (meta rewritten)
    from vector_search_databricks_poc_spark.operators.graph_ann import (
        load_graph_index,
    )

    re = load_graph_index(spark, idx.path)
    assert re.entries == idx.entries

    # search over survivors never returns a victim and stays accurate
    survivors = corpus.where(~F.col("vec_id").isin(list(victims)))
    probe = survivors.limit(10).collect()
    hitrate = 0
    for row in probe:
        qv = [float(x) for x in row["embedding"]]
        hits = idx.search(spark, qv, k=5, ef=32, nprobe=4).collect()
        got = [int(h["vec_id"]) for h in hits]
        assert not (set(got) & victims)
        exact = [
            int(r["vec_id"])
            for r in top_k_similar(survivors, qv, k=5, id_col="vec_id").collect()
        ]
        hitrate += len(set(got) & set(exact))
    assert hitrate >= 35  # ≥7/10 avg of 5 — deletion must not crater recall


def test_delete_missing_ids_reported(spark, emb, tmp_path):
    idx = build_graph_index(
        emb.where(F.col("vec_id") < 80), str(tmp_path / "gm"),
        deg=4, k_centroids=2, refine_rounds=0,
    )
    res = delete_from_graph(spark, idx, [5, 6, 99_999])
    assert res == 2 and res.skipped == 1
    # idempotent: nothing left to delete
    res2 = delete_from_graph(spark, idx, [5, 6])
    assert res2 == 0 and res2.skipped == 2
    _adjacency_clean(spark, idx, {5, 6})


def test_delete_empties_a_partition(spark, emb, tmp_path):
    corpus = emb.where(F.col("vec_id") < 120)
    idx = build_graph_index(
        corpus, str(tmp_path / "ge"), deg=4, k_centroids=3, refine_rounds=0
    )
    rows = spark.read.parquet(idx.path).select("vec_id", "centroid_id").collect()
    parts: dict[int, list[int]] = {}
    for r in rows:
        parts.setdefault(int(r["centroid_id"]), []).append(int(r["vec_id"]))
    # wipe the smallest partition entirely
    target = min(parts, key=lambda c: len(parts[c]))
    wiped = set(parts[target])
    res = delete_from_graph(spark, idx, sorted(wiped))
    assert res == len(wiped)
    assert target not in idx.entries  # entry dropped with the partition
    assert not glob.glob(f"{idx.path}/centroid_id={target}/*.parquet")
    _adjacency_clean(spark, idx, wiped)
    # the table still reads and searches
    left = spark.read.parquet(idx.path)
    assert left.count() == 120 - len(wiped)
    any_row = left.first()
    hits = idx.search(
        spark, [float(x) for x in any_row["embedding"]], k=3, ef=16, nprobe=3
    ).collect()
    assert hits


def test_delete_untouched_partitions_keep_files(spark, emb, tmp_path):
    corpus = emb.where(F.col("vec_id") < 300)
    idx = build_graph_index(
        corpus, str(tmp_path / "gu"), deg=4, k_centroids=8, refine_rounds=0
    )
    files_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{idx.path}/centroid_id=*/*.parquet")
    }
    # one victim: only its partition + its pointers' partitions rewrite
    victim = int(spark.read.parquet(idx.path).first()["vec_id"])
    delete_from_graph(spark, idx, [victim])
    untouched_same = sum(
        1
        for p, mt in files_before.items()
        if os.path.exists(p) and os.path.getmtime(p) == mt
    )
    assert untouched_same > 0, "every partition was rewritten"
    _adjacency_clean(spark, idx, {victim})


def test_delete_then_insert_roundtrip(spark, emb, tmp_path):
    corpus = emb.where(F.col("vec_id") < 150)
    idx = build_graph_index(
        corpus, str(tmp_path / "gr"), deg=4, k_centroids=3, refine_rounds=0
    )
    delete_from_graph(spark, idx, [10, 11, 12])
    fresh = emb.where(F.col("vec_id").between(150, 159))
    assert insert_into_graph(spark, idx, fresh) == 10
    _adjacency_clean(spark, idx, {10, 11, 12})
    n = spark.read.parquet(idx.path).count()
    assert n == 150 - 3 + 10


def test_delete_without_repair_just_filters_edges(spark, emb, tmp_path):
    """repair=False: victims vanish and dangling edges are filtered out,
    but pointers do NOT gain replacement edges (their lists may shrink)."""
    corpus = emb.where(F.col("vec_id") < 120)
    idx = build_graph_index(
        corpus, str(tmp_path / "gnr"), deg=4, k_centroids=3, refine_rounds=0
    )
    before = spark.read.parquet(idx.path)
    victim = int(
        before.select(F.explode("neighbors").alias("_nb"))
        .groupBy(F.col("_nb.nbr_id").alias("vec_id"))
        .agg(F.count("*").alias("d"))
        .orderBy(F.desc("d"), "vec_id")
        .first()["vec_id"]
    )
    deg_before = {
        int(r["vec_id"]): len(r["neighbors"]) for r in before.collect()
    }
    pointers = {
        vid for vid, _ in deg_before.items()
        if vid != victim
    } & {
        int(r["vec_id"])
        for r in before.where(
            F.exists("neighbors", lambda s: s["nbr_id"] == victim)
        ).collect()
    }
    res = delete_from_graph(spark, idx, [victim], repair=False)
    assert res == 1
    _adjacency_clean(spark, idx, {victim})
    after = {
        int(r["vec_id"]): len(r["neighbors"])
        for r in spark.read.parquet(idx.path).collect()
    }
    # every pointer lost exactly its dangling edges, gained nothing
    for p in pointers:
        assert after[p] == deg_before[p] - 1


def test_delete_everything_leaves_searchable_error(spark, emb, tmp_path):
    """Deleting every node empties every partition: entries clear, the
    table directory holds no data files, and a subsequent search fails
    loudly (no entry points) instead of returning stale rows."""
    corpus = emb.where(F.col("vec_id") < 60)
    idx = build_graph_index(
        corpus, str(tmp_path / "gall"), deg=4, k_centroids=2, refine_rounds=0
    )
    all_ids = sorted(
        int(r["vec_id"]) for r in spark.read.parquet(idx.path).collect()
    )
    res = delete_from_graph(spark, idx, all_ids)
    assert res == len(all_ids)
    assert idx.entries == {}
    assert not glob.glob(f"{idx.path}/centroid_id=*/*.parquet")
    with pytest.raises(ValueError, match="no entry points"):
        idx.search(spark, [0.0] * 32, k=3)
    # and the index accepts a rebuild of fresh rows afterwards
    assert insert_into_graph(spark, idx, emb.where(F.col("vec_id") < 10)) == 10


def test_recall_holds_after_interleaved_churn_waves(spark, emb, tmp_path):
    """FreshDiskANN's actual claim (VERDICT r7 #6): search quality holds
    through ongoing maintenance, not just one delete.  Three alternating
    waves of (delete a spread of live nodes, insert fresh nodes, upsert-
    replace a few survivors) then beam-search recall@10 over the final
    corpus must meet the FRESH-BUILD floor (>= 8/10 avg, the same bar
    tests/test_graph_ann.py holds a virgin index to).
    """
    from vector_search_databricks_poc_spark.operators.graph_ann import (
        upsert_into_graph,
    )

    build = emb.where(F.col("vec_id") < 300)
    reserve = emb.where(F.col("vec_id") >= 300)  # 200 fresh ids for inserts
    idx = build_graph_index(
        build, str(tmp_path / "g"), deg=4, k_centroids=4, refine_rounds=0
    )
    alive = {int(r["vec_id"]) for r in build.select("vec_id").collect()}
    reserve_ids = sorted(int(r["vec_id"]) for r in reserve.select("vec_id").collect())

    for wave in range(3):
        victims = sorted(alive)[wave::7][:40]
        deleted = delete_from_graph(spark, idx, victims)
        assert int(deleted) == len(victims)
        alive -= set(victims)

        fresh = reserve_ids[wave * 50 : wave * 50 + 50]
        ins = insert_into_graph(
            spark, idx, emb.where(F.col("vec_id").isin(fresh)), ef=32, nprobe=2
        )
        assert int(ins) == len(fresh)
        alive |= set(fresh)

        touch = sorted(alive)[wave + 3 :: 11][:10]
        up = upsert_into_graph(
            spark, idx, emb.where(F.col("vec_id").isin(touch))
        )
        assert up["upserted"] == len(touch) and up["replaced"] == len(touch)

    _adjacency_clean(spark, idx, set())
    table_ids = {
        int(r["vec_id"])
        for r in spark.read.parquet(idx.path).select("vec_id").collect()
    }
    assert table_ids == alive

    corpus = emb.where(F.col("vec_id").isin(sorted(alive)))
    probes = sorted(alive)[:: max(1, len(alive) // 8)][:8]
    total, want = 0, 0
    for pid in probes:
        qv = [float(x) for x in _qv_of(emb, pid)]
        got = {
            int(r["vec_id"])
            for r in idx.search(spark, qv, k=10, ef=48, nprobe=4).collect()
        }
        exact = {
            int(r["vec_id"])
            for r in top_k_similar(corpus, qv, k=10, id_col="vec_id").collect()
        }
        total += len(got & exact)
        want += 10
    assert total >= int(0.8 * want), f"post-churn recall {total}/{want}"


def _qv_of(emb, vid):
    return emb.where(F.col("vec_id") == vid).first()["embedding"]
