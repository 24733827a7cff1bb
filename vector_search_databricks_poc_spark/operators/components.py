"""Connected components over a pair graph (dedup clustering).

Near-dup detection yields PAIRS (dedup.py); collapsing a corpus needs
CLUSTERS — the connected components of that graph, each keeping one
representative (min id).  Spark-first rendition: iterative min-label
propagation as DataFrame joins — the driver loop only checks a convergence
COUNT per round (no data on the driver), state stays distributed, and
round count is O(graph diameter) (near-dup graphs are shallow).

An iterative fixpoint is exactly what single-pass SQL can't express;
the DuckDB oracle uses WITH RECURSIVE for the same closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id reachable.  Deterministic.  Raises if not converged in ``max_iter``
    rounds (diameter bound exceeded — raise it for pathological graphs)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        # each node adopts the min of its own and its neighbors' labels
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        # pointer jumping: adopt the label OF my label — halves label-chain
        # depth each round, so convergence is O(log diameter), not O(diameter)
        jumped = (
            new_labels.alias("x")
            .join(
                new_labels.alias("y"),
                F.col("x.component") == F.col("y.node"),
                "left",
            )
            .select(
                F.col("x.node").alias("node"),
                F.least(
                    F.col("x.component"),
                    F.coalesce(F.col("y.component"), F.col("x.component")),
                ).alias("component"),
            )
        )
        new_labels = jumped.localCheckpoint(eager=True)  # truncate lineage
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Collapse near-dup clusters: every row mapped to its cluster
    representative (min id in component; rows with no duplicate keep
    themselves)."""
    cc = connected_components(pairs, src, dst)
    return df.join(cc, df[id_col] == cc["node"], "left").select(
        df["*"],
        F.coalesce(cc["component"], df[id_col]).alias("representative"),
    )


def quality_dedup_keepers(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Quality-aware cluster representative selection: within each
    near-dup cluster keep the HIGHEST-``score_col`` member (min id on
    ties), not the min id — the curation pattern where duplicates differ
    in quality (a clean article vs its boilerplate-ridden mirror) and
    min-id keeping would throw away the good copy ~half the time.

    Output: the input rows plus ``representative`` (cluster label, from
    :func:`dedup_clusters`) and ``is_keeper``; filter ``is_keeper``
    downstream.  Singleton rows are their own cluster and always keep.

    Scale shape: the component labels join in (iterative propagation is
    the unavoidable cost, shared with every cluster consumer); keeper
    election is ONE hash-partitioned window per cluster — no
    struct-valued aggregate buffer (those fall off HashAggregate), no
    second self-join.  Deterministic for a deterministic score.
    """
    from pyspark.sql import Window

    clustered = dedup_clusters(df, pairs, id_col, src, dst)
    w = Window.partitionBy("representative").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return clustered.withColumn("is_keeper", F.row_number().over(w) == 1)
