"""Declared-query registry: the correctness surface of the engine.

Every operator from SURVEY.md §2 gets one entry here: a Spark callable
``(spark, sf_dir) -> DataFrame`` in ``QUERIES`` and, when SQL-expressible,
a DuckDB oracle string in ``ORACLE_SQL``.  Conventions (SURVEY.md §5.2/§7.4):

- deterministic only — no current_timestamp, no unseeded sampling;
- every computed column aliased identically on both sides;
- float aggregates made hash-exact: money sums go through DECIMAL(18,2)
  then cast to DOUBLE (exact on both engines); similarity scores computed
  in double and rounded to 6 decimals;
- every top-k / rank breaks ties on a unique id column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import vectors as V
from .catalog import load_table
from .operators import topk as T

QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0):
    """Fixed, deterministic query vector: the stored embedding of ``vec_id``.

    One-row collect — this is the query literal (the reference embeds the
    query text on the driver the same way, query_endpoint.py:83-115), not a
    data materialization.
    """
    row = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == vec_id)
        .select(F.col("embedding").cast("array<double>"))
        .first()
    )
    return row[0]


# ---------------------------------------------------------------------------
# B7 flagship: top-k cosine similarity search + document join
# ---------------------------------------------------------------------------

_COSINE_DUCK = (
    "ROUND(list_dot_product(e.embedding::DOUBLE[], q.qv) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.qv, q.qv))), 6)"
)


@register(
    "topk_cosine_search",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, d.text, {_COSINE_DUCK} AS score
    FROM embeddings e CROSS JOIN q
    JOIN documents d ON d.doc_id = e.vec_id
    ORDER BY score DESC, e.vec_id
    LIMIT 10
    """,
)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11+A13 Spark-native: score = cosine as Catalyst expression, top-k via
    TakeOrderedAndProject, broadcast join back to text."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    qv = _query_vector(spark, sf_dir, 0)
    hits = T.top_k_similar(emb, qv, k=10, id_col="vec_id", vec_col="embedding")
    return T.search_with_text(hits, docs)
