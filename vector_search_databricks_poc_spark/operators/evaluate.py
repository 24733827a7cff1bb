"""Index-quality evaluation: ANN recall vs brute-force ground truth.

The reference delegates index quality entirely to the managed Vector
Search service (SURVEY.md §4); a standalone engine needs the audit the
service hides: "at this nprobe, what fraction of the true top-k does the
index return?"  Run at a sampled scale before trusting an index
configuration at 100 TB — the same report shape works for any (method,
parameter) grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity_join import brute_force_topk_join


def hard_negative_mining(
    spark: SparkSession,
    index,
    queries: DataFrame,
    positives: DataFrame,
    k_neg: int = 5,
    fetch_mult: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Hard negatives for contrastive embedding training: per query, the
    ``k_neg`` highest-scoring index hits that are NOT known positives.

    ``positives`` is (query_id, id) ground-truth pairs; the index supplies
    ``fetch_mult·k_neg`` candidates per query in one batch job, positives
    are removed with a left-anti join (positives per query are few — the
    join key is (query_id, id), so the anti join shuffles candidate rows
    only), and a per-query window keeps the top survivors.  Over-fetching
    by ``fetch_mult`` keeps queries whose candidate list is positive-heavy
    from coming up short.  Returns (query_id, id, score, neg_rank).
    """
    from pyspark.sql import Window

    hits = index.batch_search(spark, queries, k=fetch_mult * k_neg, nprobe=nprobe)
    neg = hits.join(
        positives.select("query_id", id_col), on=["query_id", id_col], how="left_anti"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= k_neg)
        .select("query_id", id_col, "score", "neg_rank")
    )


def recall_report(
    spark: SparkSession,
    emb: DataFrame,
    workdir: str,
    n_queries: int = 20,
    k: int = 10,
    k_centroids: int = 8,
    nprobes: tuple[int, ...] = (1, 2, 4, 8),
    fetch_mult: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_graph: bool = True,
    graph_ef_mult: int = 2,
    include_compressed: bool = True,
) -> DataFrame:
    """Recall@k of the IVF, IVF-PQ, graph-ANN, and (r7) compressed rungs
    (binary sign-bit, PCA reduce-then-refine) across a grid.  For the
    compressed rungs the grid column doubles as their over_fetch knob —
    same cost/recall axis, different mechanism.

    Ground truth is the exact brute-force top-k for ``n_queries`` probe
    vectors drawn deterministically from the corpus (lowest ids).  Each
    report row is (method, nprobe, recall): |approx ∩ exact| divided by
    the ACTUAL ground-truth pair count (not n·k — a corpus with fewer
    than k vectors would otherwise deflate every method, including the
    exact one), computed with a distributed join per grid cell — the
    ground-truth set is tiny (≤ n·k rows) and broadcast, so corpus size
    only enters through the index searches themselves.

    Index builds write under ``workdir`` (eager by contract, like any
    CREATE INDEX); the report DataFrame itself is lazy.  Seeded KMeans
    makes the whole report deterministic for a given corpus.
    """
    from .index import build_ivf_index, build_ivf_pq_index

    queries = (
        emb.orderBy(id_col)
        .limit(n_queries)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"))
    )
    exact = (
        brute_force_topk_join(queries, emb, k=k, id_col=id_col, vec_col=vec_col)
        .select("query_id", id_col)
        .localCheckpoint(eager=False)  # reused by every grid cell
    )
    denom = exact.agg(F.count(F.lit(1)).alias("_denom"))

    ivf = build_ivf_index(emb, f"{workdir}/ivf", k_centroids=k_centroids)
    pq = build_ivf_pq_index(emb, f"{workdir}/ivfpq", k_centroids=k_centroids)

    def leg(method: str, nprobe: int, hits: DataFrame) -> DataFrame:
        inter = (
            hits.select("query_id", id_col)
            .join(F.broadcast(exact), on=["query_id", id_col], how="inner")
            .agg(F.count(F.lit(1)).alias("_hits"))
        )
        return inter.join(F.broadcast(denom)).select(
            F.lit(method).alias("method"),
            F.lit(nprobe).alias("nprobe"),
            F.round(F.col("_hits") / F.col("_denom"), 4).alias("recall"),
        )

    def pq_rerank(nprobe: int) -> DataFrame:
        """The PQ production shape: fetch ``fetch_mult·k`` candidates by
        quantized ADC score, then rescore those exactly against the float
        vectors and keep top-k — measures the pipeline, not the raw
        quantized ordering.  ``fetch_mult`` is the recall/cost knob this
        report exists to tune (deeper fetch → higher recall → more float
        rows read for rerank)."""
        from pyspark.sql import Window

        from .. import vectors as V

        cands = pq.batch_search(spark, queries, k=fetch_mult * k, nprobe=nprobe)
        scored = (
            cands.select("query_id", id_col)
            .join(emb.select(id_col, vec_col), id_col)
            .join(F.broadcast(queries), "query_id")
            .select(
                "query_id",
                id_col,
                V.cosine(vec_col, F.col("query_vec")).alias("_s"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("_s"), F.col(id_col))
        return scored.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= k)

    legs = []
    for nprobe in nprobes:
        legs.append(
            leg("ivf", nprobe, ivf.batch_search(spark, queries, k=k, nprobe=nprobe))
        )
        legs.append(
            leg("ivf_pq", nprobe, pq.batch_search(spark, queries, k=k, nprobe=nprobe))
        )
        legs.append(leg("ivf_pq_rerank", nprobe, pq_rerank(nprobe)))
    if include_graph:
        # graph's recall knob is the beam width, so the grid scales ef WITH
        # the probed-entry count (ef = graph_ef_mult·k·nprobe): both seed
        # breadth and beam width widen together, making recall move the way
        # an nprobe sweep does for IVF
        from .graph_ann import build_graph_index

        g = build_graph_index(
            emb, f"{workdir}/graph", deg=8, k_centroids=k_centroids,
            id_col=id_col, vec_col=vec_col,
        )
        for nprobe in nprobes:
            legs.append(
                leg(
                    "graph",
                    nprobe,
                    g.batch_search(
                        spark, queries, k=k, ef=graph_ef_mult * k * nprobe,
                        nprobe=nprobe,
                    ),
                )
            )
    if include_compressed:
        from .binary_quant import binary_batch_search, mean_vector
        from .pca import fit_pca, pca_batch_search

        mean = mean_vector(emb, vec_col)
        model = fit_pca(emb, vec_col=vec_col, k=max(2, len(mean) // 2))
        for of in nprobes:  # grid value = over_fetch for these rungs
            legs.append(
                leg(
                    "binary",
                    of,
                    binary_batch_search(
                        queries, emb, mean, k=k, over_fetch=of,
                        id_col=id_col, vec_col=vec_col,
                    ),
                )
            )
            legs.append(
                leg(
                    "pca",
                    of,
                    pca_batch_search(
                        queries, emb, model, k=k, over_fetch=of,
                        id_col=id_col, vec_col=vec_col,
                    ),
                )
            )
    out = legs[0]
    for l in legs[1:]:
        out = out.unionByName(l)
    return out.orderBy("method", "nprobe")
