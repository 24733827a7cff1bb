"""SemDeDup cluster-scoped semantic dedup (operators/semdedup.py).

Correctness model: the keep rule is a total-order greedy, so an
independent pure-numpy reference (same centroid assignment, same visit
order) must reproduce the keeper set EXACTLY — both on the lazy seeded
path and the fitted-centroid path.  Plus planted-duplicate semantics,
eps edge cases, and partitioning invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_search_databricks_poc_spark.operators.semdedup import semantic_dedup

_P31 = 2147483647
_MIX = 2654435761


def _mix_hash(i: int) -> int:
    return (i % _P31) * _MIX % _P31


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .cache()
    )


def _collect_vecs(emb) -> dict[int, np.ndarray]:
    return {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }


def _ref_semdedup(vecs: dict[int, np.ndarray], eps: float, k: int):
    """Independent reference of the seeded path: seed selection, cosine
    assignment (round 6, ties to smaller seed id), greedy prune in
    (centroid_sim asc, id asc) order."""
    ids = sorted(vecs)
    seeds = sorted(ids, key=lambda i: (_mix_hash(i), i))[:k]

    def cos(a, b):
        na = max(np.sqrt(a @ a), 1e-12)
        nb = max(np.sqrt(b @ b), 1e-12)
        return round(float(a @ b) / (na * nb), 6)

    assign: dict[int, tuple[int, float]] = {}
    for i in ids:
        best = max(seeds, key=lambda s: (cos(vecs[i], vecs[s]), -s))
        assign[i] = (best, cos(vecs[i], vecs[best]))

    keepers = set()
    for s in seeds:
        members = sorted(
            (i for i in ids if assign[i][0] == s),
            key=lambda i: (assign[i][1], i),
        )
        kept: list[int] = []
        for i in members:
            xi = vecs[i] / max(np.sqrt(vecs[i] @ vecs[i]), 1e-12)
            ok = True
            for j in kept:
                xj = vecs[j] / max(np.sqrt(vecs[j] @ vecs[j]), 1e-12)
                if float(xi @ xj) >= eps:
                    ok = False
                    break
            if ok:
                kept.append(i)
        keepers.update(kept)
    return assign, keepers


def test_seeded_path_matches_independent_reference(spark, emb):
    eps, k = 0.8, 6
    sub = emb.where(F.col("vec_id") < 120)
    out = semantic_dedup(sub, id_col="vec_id", vec_col="embedding",
                         eps=eps, k_clusters=k).collect()
    vecs = _collect_vecs(sub)
    assign, keepers = _ref_semdedup(vecs, eps, k)
    assert len(out) == len(vecs)
    for r in out:
        i = int(r["vec_id"])
        assert int(r["cluster"]) == assign[i][0], (i, r)
        assert abs(float(r["centroid_sim"]) - assign[i][1]) < 1e-6
        assert bool(r["is_keeper"]) == (i in keepers), (i, r)


def test_fitted_centroid_path_matches_reference(spark, emb):
    """Same greedy semantics on the expression-assignment path: centroids
    are explicit literals, assignment nearest-by-L2; the reference
    recomputes both."""
    eps = 0.85
    sub = emb.where(F.col("vec_id") < 100)
    vecs = _collect_vecs(sub)
    ids = sorted(vecs)
    cents = [vecs[ids[0]].tolist(), vecs[ids[1]].tolist(), vecs[ids[2]].tolist()]
    out = semantic_dedup(sub, id_col="vec_id", vec_col="embedding",
                         eps=eps, centroids=cents).collect()

    def l2sq(a, b):
        d = a - b
        return float(d @ d)

    keepers = set()
    assign = {}
    for i in ids:
        dists = [l2sq(vecs[i], np.asarray(c)) for c in cents]
        assign[i] = int(np.argmin(dists))
    for c in range(len(cents)):
        cv = np.asarray(cents[c])

        def csim(i):
            a = vecs[i]
            return round(
                float(a @ cv)
                / (max(np.sqrt(a @ a), 1e-12) * max(np.sqrt(cv @ cv), 1e-12)),
                6,
            )

        members = sorted((i for i in ids if assign[i] == c),
                         key=lambda i: (csim(i), i))
        kept: list[int] = []
        for i in members:
            xi = vecs[i] / max(np.sqrt(vecs[i] @ vecs[i]), 1e-12)
            if all(float(xi @ (vecs[j] / max(np.sqrt(vecs[j] @ vecs[j]), 1e-12))) < eps
                   for j in kept):
                kept.append(i)
        keepers.update(kept)
    got = {int(r["vec_id"]): bool(r["is_keeper"]) for r in out}
    assert got == {i: (i in keepers) for i in ids}


def test_planted_duplicates_collapse(spark, emb):
    """Three exact copies of one vector (distinct ids) → exactly one
    keeper among them, regardless of cluster count."""
    sub = emb.where(F.col("vec_id") < 50)
    v0 = sub.where(F.col("vec_id") == 0).first()["embedding"]
    dupes = sub.sparkSession.createDataFrame(
        [(1001, list(v0)), (1002, list(v0))],
        "vec_id long, embedding array<float>",
    )
    planted = sub.select("vec_id", "embedding").unionByName(dupes)
    out = semantic_dedup(planted, id_col="vec_id", vec_col="embedding",
                         eps=0.999, k_clusters=4).collect()
    trio = [r for r in out if int(r["vec_id"]) in (0, 1001, 1002)]
    assert len(trio) == 3
    assert sum(bool(r["is_keeper"]) for r in trio) == 1
    # exact copies share a cluster by construction (identical sims)
    assert len({int(r["cluster"]) for r in trio}) == 1


def test_eps_above_one_keeps_everything(spark, emb):
    sub = emb.where(F.col("vec_id") < 60)
    out = semantic_dedup(sub, id_col="vec_id", vec_col="embedding",
                         eps=1.000001, k_clusters=5)
    assert out.where(~F.col("is_keeper")).count() == 0


def test_every_dropped_doc_is_covered_by_a_keeper(spark, emb):
    """Greedy invariant: a non-keeper must lie within eps of at least one
    keeper of ITS cluster (that's why it was dropped), and keepers of the
    same cluster must be mutually below eps."""
    eps = 0.85
    sub = emb.where(F.col("vec_id") < 120)
    out = semantic_dedup(sub, id_col="vec_id", vec_col="embedding",
                         eps=eps, k_clusters=6).collect()
    vecs = _collect_vecs(sub)

    def unit(i):
        v = vecs[i]
        return v / max(np.sqrt(v @ v), 1e-12)

    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(int(r["cluster"]), []).append(r)
    assert sum(len(v) for v in by_cluster.values()) == len(vecs)
    for rows in by_cluster.values():
        kept = [int(r["vec_id"]) for r in rows if r["is_keeper"]]
        dropped = [int(r["vec_id"]) for r in rows if not r["is_keeper"]]
        for a_i, a in enumerate(kept):
            for b in kept[a_i + 1:]:
                assert float(unit(a) @ unit(b)) < eps, (a, b)
        for d in dropped:
            assert any(float(unit(d) @ unit(k)) >= eps for k in kept), d


def test_deterministic_across_repartition(spark, emb):
    sub = emb.where(F.col("vec_id") < 150)
    a = semantic_dedup(sub, id_col="vec_id", vec_col="embedding",
                       eps=0.9, k_clusters=8)
    b = semantic_dedup(sub.repartition(11), id_col="vec_id",
                       vec_col="embedding", eps=0.9, k_clusters=8)
    ka = {r["vec_id"] for r in a.where("is_keeper").collect()}
    kb = {r["vec_id"] for r in b.where("is_keeper").collect()}
    assert ka == kb


def test_zero_vector_does_not_nan(spark):
    rows = [(1, [0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]), (3, [1.0, 0.0, 1e-9])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, id_col="vec_id", vec_col="embedding",
                         eps=0.95, k_clusters=2).collect()
    assert len(out) == 3
    assert all(r["centroid_sim"] is not None for r in out)


def test_eps_guard(spark, emb):
    with pytest.raises(ValueError):
        semantic_dedup(emb, id_col="vec_id", eps=0.0)


def test_seeded_path_matches_duckdb_recursive(spark, emb):
    """Full SQL re-derivation of the seeded path in DuckDB — seeds by
    mixed hash, argmax-cosine assignment, and the greedy eps-prune as a
    per-cluster recursive CTE carrying the kept list.  Independent of
    both the Spark plan and the numpy reference (engine-portability of
    the whole operator, the same bar the driver-checked queries meet)."""
    import duckdb

    eps, k = 0.9, 16
    out = semantic_dedup(
        emb, id_col="vec_id", vec_col="embedding", eps=eps, k_clusters=k
    )
    got = {
        (int(r["vec_id"]), int(r["cluster"]), bool(r["is_keeper"]))
        for r in out.collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    sql = f"""
    WITH RECURSIVE
    nv AS (
      SELECT vec_id,
             embedding::DOUBLE[] AS raw,
             list_transform(embedding::DOUBLE[],
               x -> x / greatest(sqrt(list_dot_product(embedding::DOUBLE[],
                                                       embedding::DOUBLE[])),
                                 1e-12)) AS v
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS sid, raw AS sraw
      FROM nv
      ORDER BY ((vec_id % {_P31}) * {_MIX}) % {_P31}, vec_id
      LIMIT {k}
    ),
    sim AS (
      SELECT n.vec_id, s.sid,
             ROUND(list_dot_product(n.raw, s.sraw)
                   / (greatest(sqrt(list_dot_product(n.raw, n.raw)), 1e-12)
                      * greatest(sqrt(list_dot_product(s.sraw, s.sraw)), 1e-12)),
                   6) AS centroid_sim
      FROM nv n CROSS JOIN seeds s
    ),
    mem AS (
      SELECT vec_id, cluster, centroid_sim,
             ROW_NUMBER() OVER (PARTITION BY cluster
                                ORDER BY centroid_sim ASC, vec_id ASC) AS rnk
      FROM (
        SELECT vec_id, sid AS cluster, centroid_sim,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY centroid_sim DESC, sid ASC) AS rk
        FROM sim
      ) WHERE rk = 1
    ),
    greedy(cluster, rnk, kept) AS (
      SELECT cluster, rnk, [vec_id] FROM mem WHERE rnk = 1
      UNION ALL
      SELECT m.cluster, m.rnk,
             CASE WHEN (
               SELECT MAX(list_dot_product(a.v, b.v))
               FROM unnest(g.kept) u(kid)
               JOIN nv b ON b.vec_id = u.kid
               CROSS JOIN nv a
               WHERE a.vec_id = m.vec_id
             ) < {eps}
             THEN list_append(g.kept, m.vec_id) ELSE g.kept END
      FROM greedy g JOIN mem m ON m.cluster = g.cluster AND m.rnk = g.rnk + 1
    ),
    final AS (
      SELECT cluster, arg_max(kept, rnk) AS kept FROM greedy GROUP BY cluster
    )
    SELECT m.vec_id, m.cluster,
           list_contains(f.kept, m.vec_id) AS is_keeper
    FROM mem m JOIN final f USING (cluster)
    """
    want = {
        (int(r[0]), int(r[1]), bool(r[2])) for r in con.sql(sql).fetchall()
    }
    con.close()
    assert got == want
