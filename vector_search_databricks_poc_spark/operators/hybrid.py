"""Hybrid search: lexical BM25 + vector similarity with reciprocal-rank
fusion (the query mode managed vector-search services call "hybrid"; the
reference's service exposes it, ours rebuilds it as DataFrame plans).

- BM25 is computed entirely with expressions: document term frequencies by
  explode+filter, document frequencies by a broadcast aggregate over the
  corpus, the classic k1/b saturation formula per (doc, term).
- Fusion is RRF: score = sum over systems of 1/(rrf_k + rank) — robust to
  incomparable score scales, no tuning beyond rrf_k=60.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, bm25) for every document containing at least one query term.

    IDF uses the standard BM25 form ln(1 + (N-df+0.5)/(df+0.5)).  Corpus
    stats (N, avgdl) stay IN the plan as a broadcast one-row cross join —
    no driver-side action, the whole pipeline is one lazy plan.  df_counts
    (bounded by the query-term count) is broadcast; doc_len is per-document
    and left to Catalyst (a forced broadcast would OOM at corpus scale).

    Document length is ``F.size`` of the token array — a map-side
    projection, NOT an explode + groupBy (the r3 formulation shuffled
    every token row back into per-doc counts; same values, one full-corpus
    shuffle less).  The explode survives only on the term-frequency leg,
    where the query-term filter prunes it before the partial aggregate.
    """
    terms = [t.lower() for t in query_terms]
    # size > 0 mirrors explode semantics: empty/null token arrays produce
    # no doc_len row, so N and avgdl are unchanged from the explode form.
    # Lazy checkpoint: doc_len feeds BOTH the stats aggregate and the
    # per_term join — uncut, Catalyst duplicates the subtree and the
    # corpus would be scanned+tokenized twice for it
    doc_len = docs.select(
        F.col(id_col), F.size(tokens(F.lower(F.col(text_col)))).alias("dl")
    ).where(F.col("dl") > 0).localCheckpoint(eager=False)
    stats = doc_len.agg(
        F.count("*").cast("double").alias("_N"), F.avg("dl").alias("_avgdl")
    )
    tok = docs.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )

    qterms = F.array(*[F.lit(t) for t in terms])
    tf = (
        tok.where(F.array_contains(qterms, F.col("term")))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        1.0
        + (F.col("_N") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = (
        tf.join(F.broadcast(df_counts), "term")
        .join(doc_len, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl")))
            ).alias("_s"),
        )
    )
    return per_term.groupBy(id_col).agg(F.round(F.sum("_s"), 6).alias("bm25"))


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_cols: list[str] | None = None,
    rrf_k: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of pre-ranked result sets.  Each input must
    have (id_col, <rank_col>); missing ids in one system contribute 0."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    rank_cols = rank_cols or [f"rank_{i}" for i in range(len(rankings))]
    if len(rank_cols) != len(rankings):
        # zip() would silently drop the unmatched systems from the fusion
        raise ValueError(
            f"{len(rankings)} rankings but {len(rank_cols)} rank_cols"
        )
    fused = None
    for df, rc in zip(rankings, rank_cols):
        part = df.select(
            F.col(id_col), (1.0 / (F.lit(rrf_k) + F.col(rc))).alias("_c")
        )
        fused = part if fused is None else fused.unionByName(part)
    return (
        fused.groupBy(id_col)
        .agg(F.round(F.sum("_c"), 6).alias("rrf"))
        .orderBy(F.desc("rrf"), F.col(id_col))
        .limit(k)
    )


def hybrid_search(
    docs: DataFrame,
    vectors: DataFrame,
    query_terms: list[str],
    query_vector,
    k: int = 10,
    pool: int = 50,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    rrf_k: int = 60,
) -> DataFrame:
    """Top-k by RRF of (BM25 top-``pool``, cosine top-``pool``).

    ``query_vector`` may be a Python sequence (becomes a literal) or a
    ONE-ROW DataFrame whose single column is the vector — the DataFrame
    form keeps the query inside the plan (broadcast cross join), so the
    whole hybrid search is one lazy plan with no driver-side fetch."""
    from .. import vectors as V

    lex = bm25_scores(docs, query_terms, id_col=id_col)
    w_lex = Window.orderBy(F.desc("bm25"), F.col(id_col))
    lex_ranked = lex.orderBy(F.desc("bm25"), F.col(id_col)).limit(pool).withColumn(
        "rank_lex", F.row_number().over(w_lex)
    )

    if isinstance(query_vector, DataFrame):
        # re-alias the query column before the cross join: embed_text
        # naturally names it 'embedding', which would collide with the
        # corpus vector column and make both references ambiguous
        qdf = query_vector.select(F.col(query_vector.columns[0]).alias("_hq"))
        src = vectors.crossJoin(F.broadcast(qdf))
        q = F.col("_hq")
    else:
        src = vectors
        q = V.lit_vector(query_vector)
    # the vector leg IS top_k_similar (same score expression, null/NaN
    # guard, ordering, and limit — one definition, not a copy)
    from .topk import top_k_similar

    w_vec = Window.orderBy(F.desc("cos"), F.col(id_col))
    vec_ranked = (
        top_k_similar(src, q, k=pool, id_col=vec_id_col)
        .select(F.col(vec_id_col).alias(id_col), F.col("score").alias("cos"))
        .withColumn("rank_vec", F.row_number().over(w_vec))
    )

    return rrf_fuse(
        [lex_ranked, vec_ranked],
        id_col=id_col,
        rank_cols=["rank_lex", "rank_vec"],
        rrf_k=rrf_k,
        k=k,
    )
