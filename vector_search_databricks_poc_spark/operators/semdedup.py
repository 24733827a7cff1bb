"""SemDeDup: cluster-scoped semantic deduplication over an embedding
column (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication").

The published scale trick: never compare all pairs — k-means the corpus
into clusters, then prune near-duplicates ONLY within each cluster.  The
quadratic work becomes local (cluster-sized), embarrassingly parallel,
and linear in the corpus for a fixed target cluster size.  This slots
between the two existing embedding-dedup paths:

- ``packing.cluster_dedup``     — ONE representative per coarse cluster;
- **this module**               — many keepers per cluster, near-dups
  within ``eps`` pruned (the SemDeDup semantics);
- ``dedup.embedding_near_dup_pairs`` — explicit pair output (blocked
  exact or SRP-LSH), when the caller needs the pairs themselves.

Keep rule (deterministic): cluster members are visited in INCREASING
similarity-to-centroid order (ties by id) and a member is kept iff its
cosine similarity to every already-kept member is below ``eps``.  That
is the paper's "keep the low-centroid-similarity example from each
duplicate group", realized greedily — the first member of any duplicate
group to be visited is its farthest-from-centroid example, and the rest
prune against it.  Deterministic on any partitioning: the visit order is
a total order.

100 TB shape: assignment is pure expressions (broadcast centroids —
in-plan literals on the fitted path, an explode-join on the lazy seeded
path); the pruner is one ``applyInPandas`` over clusters (one shuffle on
the cluster key).  Memory per task is O(cluster_size * dim) — size
``k_clusters ~ n / target_cluster_size`` (the paper uses ~50k clusters
for LAION-scale corpora).  Skewed clusters are a data property; cap them
upstream with ``sampling.cap_per_group`` if one cluster swallows the
corpus.

Reference parity: none — the reference engine's dedup story is managed
Databricks services (SURVEY.md §2B-10); this family is part of the
mandated beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import vectors as V
from .packing import _mix_hash

__all__ = ["semantic_dedup"]

_NORM_FLOOR = 1e-12  # zero-vector guard: cosine denominators clamp here


def _pruner(eps: float, id_field: str):
    """Grouped-map pruner factory: greedy eps-cosine prune of one cluster
    in (centroid_sim asc, id asc) order.  Vectorized: each candidate
    scores against the kept matrix with one BLAS mat-vec."""
    import numpy as np
    import pandas as pd

    globals().setdefault("pd", pd)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["centroid_sim", id_field], kind="mergesort"
        ).reset_index(drop=True)
        x = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.sqrt((x * x).sum(axis=1))
        np.maximum(norms, _NORM_FLOOR, out=norms)
        xn = x / norms[:, None]
        n = len(pdf)
        kept_rows = np.empty_like(xn)
        kept = np.zeros(n, dtype=bool)
        n_kept = 0
        for i in range(n):
            if n_kept == 0 or float((kept_rows[:n_kept] @ xn[i]).max()) < eps:
                kept_rows[n_kept] = xn[i]
                kept[i] = True
                n_kept += 1
        out = pdf[[id_field, "cluster", "centroid_sim"]].copy()
        out["is_keeper"] = kept
        return out

    return prune


def semantic_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    eps: float = 0.95,
    centroids: list[list[float]] | None = None,
    k_clusters: int = 16,
) -> DataFrame:
    """SemDeDup over ``df[vec_col]``: returns
    ``(id_col, cluster, centroid_sim, is_keeper)`` — one row per input
    row; keep ``is_keeper`` downstream.

    Two assignment paths:

    - ``centroids`` given (e.g. from ``index.fit_centroids`` — the KMeans
      treatment): nearest-centroid by L2 as in-plan literal expressions,
      ``centroid_sim`` = cosine to the assigned centroid.  The fit is the
      caller's (eager) training job; THIS plan stays lazy.
    - ``centroids=None``: fully lazy deterministic seeding — the
      ``k_clusters`` rows with the smallest mixed id hash are the
      centroids (same recipe as ``packing.cluster_dedup``), assignment by
      max cosine via a broadcast explode-join.  No RNG, no fit job.

    ``eps`` in (0, 1]: 0.95 prunes near-identical, lower is more
    aggressive.  ``eps > 1`` keeps everything (useful as a no-op guard).
    """
    if eps <= 0.0:
        raise ValueError(f"eps must be > 0, got {eps}")
    from ..catalog import ensure_parallelism

    id_type = df.schema[id_col].dataType.simpleString()

    # assignment is CPU-heavy per row (k*dim arithmetic, or the posexplode
    # dot-product join on the seeded path) and input-split parallelism is
    # sized by BYTES — guard against a small single-file corpus arriving
    # as one task (no-op at real input sizes; same as the minhash stage)
    base = ensure_parallelism(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
    )
    if centroids is not None:
        from .index import _l2sq

        cents = F.array(*[V.lit_vector(c) for c in centroids])
        dists = F.transform(cents, lambda c: _l2sq(F.col("_v"), c))
        assigned = base.withColumn(
            "cluster", F.array_position(dists, F.array_min(dists)).cast("int") - 1
        ).withColumn("_c", F.element_at(cents, F.col("cluster") + 1))
        sim = V.dot("_v", "_c") / (
            F.greatest(V.l2_norm("_v"), F.lit(_NORM_FLOOR))
            * F.greatest(V.l2_norm("_c"), F.lit(_NORM_FLOOR))
        )
        assigned = assigned.withColumn(
            "centroid_sim", F.round(sim, 6)
        ).drop("_c")
    else:
        seeds = (
            base.select(
                F.col("_id").alias("_sid"),
                F.col("_v").alias("_sv"),
                _mix_hash("_id").alias("_h"),
            )
            .orderBy("_h", "_sid")
            .limit(k_clusters)
        )
        ex = base.select("_id", F.posexplode("_v").alias("_i", "_x"))
        sx = seeds.select("_sid", F.posexplode("_sv").alias("_i", "_y"))
        dots = (
            ex.join(F.broadcast(sx), "_i")
            .groupBy("_id", "_sid")
            .agg(
                F.sum(F.col("_x") * F.col("_y")).alias("_dot"),
                F.sum(F.col("_x") * F.col("_x")).alias("_nx"),
                F.sum(F.col("_y") * F.col("_y")).alias("_ny"),
            )
            .select(
                "_id",
                "_sid",
                F.round(
                    F.col("_dot")
                    / (
                        F.greatest(F.sqrt("_nx"), F.lit(_NORM_FLOOR))
                        * F.greatest(F.sqrt("_ny"), F.lit(_NORM_FLOOR))
                    ),
                    6,
                ).alias("centroid_sim"),
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("_id").orderBy(
            F.desc("centroid_sim"), F.col("_sid")
        )
        best = (
            dots.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select("_id", F.col("_sid").alias("cluster"), "centroid_sim")
        )
        assigned = base.join(best, "_id")

    grouped = assigned.select("_id", "_v", "cluster", "centroid_sim")
    out = grouped.groupBy("cluster").applyInPandas(
        _pruner(float(eps), "_id"),
        schema=(
            f"_id {id_type}, cluster int, centroid_sim double, is_keeper boolean"
        ),
    )
    return out.withColumnRenamed("_id", id_col)
