"""PageRank centrality over pair graphs (Page et al. 1999; Brin & Page 1998).

Web-crawl training corpora weight documents by host/link centrality
(e.g. harmonic/PageRank filtering over the CommonCrawl host graph), and
near-dup clusters pick their representative better by centrality than by
raw length: the most-connected member is the least likely to be a
truncated or mangled variant.  Both reduce to PageRank over an edge set
the engine already produces (near-dup pairs, host links).

Spark-first shape: the power iteration is a fixed-count loop of
DataFrame joins — rank state stays distributed; the driver holds no data.
Per iteration: one equi-join (contributions) + one groupBy-sum
(gather) = 2 shuffles; the iteration count is the documented knob
(convergence is geometric in the damping factor; 8-20 covers practice).
Each round ends in a lazy ``localCheckpoint`` — without it the lineage
doubles per round (the dangling-mass scalar re-references the previous
ranks), turning analysis exponential.

At 100 TB: edges pre-partitioned by ``src`` let every iteration's join
reuse one partitioning; ranks are O(V) not O(E); the dangling-mass and
vertex-count scalars are 1-row broadcast aggregates, never driver
round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .components import connected_components

__all__ = ["pagerank", "undirected_pagerank", "centrality_keepers"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    handle_dangling: bool = True,
) -> DataFrame:
    """(node, rank) after ``iters`` power iterations on the directed edge
    set.  Ranks sum to 1 (dangling mass redistributed uniformly when
    ``handle_dangling``; with it off, dangling mass is dropped — correct
    for graphs known to have out-edges everywhere, one agg cheaper).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    verts = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    n_df = F.broadcast(verts.agg(F.count("*").cast("double").alias("n")))
    ranks = verts.crossJoin(n_df).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iters):
        r_deg = ranks.join(
            out_deg, ranks["node"] == out_deg["src"], "left"
        ).select("node", "rank", "deg")
        contrib = (
            e.join(
                r_deg.where(F.col("deg").isNotNull()).select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("deg")).alias("w"),
                ),
                on="src",
            )
            .groupBy("dst")
            .agg(F.sum("w").alias("inflow"))
        )
        nxt = verts.join(contrib, verts["node"] == contrib["dst"], "left").select(
            "node", F.coalesce("inflow", F.lit(0.0)).alias("inflow")
        )
        if handle_dangling:
            dang = F.broadcast(
                r_deg.where(F.col("deg").isNull()).agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling")
                )
            )
            nxt = nxt.crossJoin(dang)
        else:
            nxt = nxt.withColumn("dangling", F.lit(0.0))
        ranks = nxt.crossJoin(n_df).select(
            "node",
            (
                (1.0 - damping) / F.col("n")
                + damping * (F.col("inflow") + F.col("dangling") / F.col("n"))
            ).alias("rank"),
        ).localCheckpoint(eager=False)
    return ranks


def undirected_pagerank(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """PageRank on the symmetrized pair graph.  Every node has out-edges
    by construction, so the dangling aggregate is skipped."""
    sym = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    return pagerank(
        sym, damping=damping, iters=iters, handle_dangling=False
    )


def centrality_keepers(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    damping: float = 0.85,
    iters: int = 10,
    max_iter_components: int = 20,
    round_to: int | None = None,
) -> DataFrame:
    """Near-dup representative selection by centrality: one row per node
    in the pair graph with its component, PageRank, and ``is_keeper``
    (the component's max-rank member, ties to min id).

    ``round_to`` rounds ranks BEFORE keeper selection — pass it whenever
    the keeper choice must be reproducible across engines/summation
    orders (analytically-tied ranks can differ in the last ulp).

    The most-central cluster member is the canonical variant; length/
    quality keepers (components.quality_dedup_keepers) are the
    content-signal alternative."""
    ranks = undirected_pagerank(pairs, id_a, id_b, damping=damping, iters=iters)
    if round_to is not None:
        ranks = ranks.withColumn("rank", F.round("rank", round_to))
    comp = connected_components(
        pairs.select(id_a, id_b), src=id_a, dst=id_b, max_iter=max_iter_components
    )
    w = Window.partitionBy("component").orderBy(F.desc("rank"), F.asc("node"))
    return (
        comp.join(ranks, on="node")
        .withColumn("is_keeper", F.row_number().over(w) == 1)
        .select("node", "component", "rank", "is_keeper")
    )
