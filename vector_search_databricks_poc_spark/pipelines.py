"""End-to-end pipeline assembly (SURVEY.md §3.1/§3.2 equivalents).

The reference's two notebook jobs, re-expressed as single DataFrame jobs:

- §3.1 ``build_index_pipeline``: ingest -> clean -> embed -> normalize ->
  IVF-partitioned index table (replaces create_table_and_index +
  create_delta_sync_index, syntetic_data_arxiv.py + syntetic_data.py:95-107).
- §3.2 ``search_pipeline``: query text -> embed through the SAME encoder
  path -> top-k against the index -> dedup/clean -> context assembly
  (replaces query_endpoint.py + backend main.py's retrieval half).

Batch-oriented per the north star ("bulk index building and batch similarity
searches, not online ANN serving"): the "endpoint" is a job, matching the
reference's TRIGGERED pipeline semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.embedding import embed_text
from .operators.index import IvfIndex, build_ivf_index
from .operators.rag import assemble_context, clean_hits
from .operators.topk import top_k_similar


def build_index_pipeline(
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    encoder: str = "hashing",
    dim: int = 64,
    k_centroids: int = 16,
) -> IvfIndex:
    """§3.1 as one lazy DataFrame job: no intermediate materialization
    except the final partitioned index write."""
    cleaned = docs.select(
        F.col(id_col),
        F.trim(F.regexp_replace(F.col(text_col), "\\s+", " ")).alias(text_col),
    ).where(F.col(text_col) != "")
    embedded = embed_text(cleaned, text_col=text_col, out_col="embedding",
                          encoder=encoder, dim=dim)
    return build_ivf_index(
        embedded, index_path, id_col=id_col, vec_col="embedding",
        k_centroids=k_centroids,
    )


def search_pipeline(
    spark: SparkSession,
    index: IvfIndex,
    docs: DataFrame,
    query_text: str,
    k: int = 5,
    nprobe: int = 4,
    encoder: str = "hashing",
    dim: int = 64,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """§3.2: embed the query through the same encoder as the corpus
    (A7=A12 unification), probe the index, join text back, dedup, assemble
    the RAG context.  Returns a 1-row DataFrame with the context string."""
    qdf = spark.createDataFrame([(query_text,)], [text_col])
    qvec = embed_text(qdf, text_col=text_col, encoder=encoder, dim=dim).select(
        "embedding"
    ).first()[0]
    hits = index.search(spark, list(qvec), k=k, nprobe=nprobe)
    with_text = docs.join(
        F.broadcast(hits), on=docs[doc_id_col] == hits[index.id_col], how="inner"
    ).select(hits[index.id_col].alias("vec_id"), docs[text_col].alias("text"), hits["score"])
    return assemble_context(clean_hits(with_text))
