"""Top-k similarity search (SURVEY.md B7/B11 — the flagship operator).

Reference behavior: ``index.similarity_search(query_vector=..., num_results=k)``
(query_endpoint.py:136-150) and its text-query twin (main.py:56).  Spark-first
rendition: score every corpus vector with a Catalyst expression and take the
top k with ``ORDER BY score DESC LIMIT k`` — Catalyst plans this as
``TakeOrderedAndProject`` (per-partition heap + driver merge of k rows), so
no global sort and no full materialization even at 100 TB.

Determinism contract: ties on score are broken by the id column in every
code path, so results are stable across partitionings and match the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import vectors as V

METRICS = ("cosine", "dot", "l2")


def score_expr(vec_col: str, query: Column, metric: str = "cosine") -> Column:
    if metric == "cosine":
        return V.cosine(vec_col, query)
    if metric == "dot":
        return V.dot(vec_col, query)
    if metric == "l2":
        # negate so "higher is better" holds for every metric
        return -V.l2_distance(vec_col, query)
    raise ValueError(f"metric must be one of {METRICS}, got {metric!r}")


def top_k_similar(
    corpus: DataFrame,
    query_vector,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    score_decimals: int | None = 6,
) -> DataFrame:
    """Top-k rows of ``corpus`` most similar to one query vector.

    Returns (id_col, score) ordered by score desc, ties by id.  ``query_vector``
    is a Python sequence or a Column.  ``score_decimals`` rounds the score for
    oracle hash-stability; pass None for full precision.
    """
    if metric == "cosine" and not isinstance(query_vector, Column):
        # literal query: its norm folds ONCE on the driver (bit-identical
        # to the in-plan fold, see python_l2_norm) instead of per corpus
        # row — cuts the interpreted per-row HOF work from 3 folds to 2
        # (measured 0.50s -> 0.31s on the sf0.1 flagship scan)
        q = V.lit_vector(query_vector)
        denom = V.l2_norm(vec_col) * F.lit(V.python_l2_norm(query_vector))
        score = F.when(denom != 0, V.dot(vec_col, q) / denom)
    else:
        q = query_vector if isinstance(query_vector, Column) else V.lit_vector(query_vector)
        score = score_expr(vec_col, q, metric)
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    return (
        corpus.select(F.col(id_col), score.alias("score"))
        .where(F.col("score").isNotNull() & ~F.isnan("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def rerank(
    candidates: DataFrame,
    query_vector,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    score_decimals: int | None = 6,
) -> DataFrame:
    """Second-stage exact rescoring (reference's imported-but-dormant
    DatabricksReranker, query_endpoint.py:12 — SURVEY.md A15/B11).

    Takes a candidate set (e.g. top c*k by a cheap metric or an ANN bucket
    probe) and re-scores with the exact metric, keeping the top k.
    """
    return top_k_similar(
        candidates, query_vector, k=k, id_col=id_col, vec_col=vec_col,
        metric=metric, score_decimals=score_decimals,
    )


def search_with_text(
    result: DataFrame,
    documents: DataFrame,
    id_col: str = "vec_id",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Join scores back to document text (reference returns [text, id, score]
    rows, main.py:56-70).  The k-row result side is broadcast."""
    return (
        documents.join(
            F.broadcast(result), on=documents[doc_id_col] == result[id_col], how="inner"
        )
        .select(result[id_col], documents[text_col].alias("text"), result["score"])
        .orderBy(F.desc("score"), F.col(id_col))
    )
