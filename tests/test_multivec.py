"""Multi-vector late-interaction (MaxSim) search: full DuckDB
re-derivation of the declared query, retrieve-then-rerank equivalence,
recall floor, null honesty, and plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import vector_search_databricks_poc_spark.queries_registry as R
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.multivec import (
    build_token_table,
    maxsim_topk,
    maxsim_topk_pruned,
    multi_vector_expr,
    py_multi_vector,
)
from vector_search_databricks_poc_spark.plans import audit

DIM = 16
QT = R._MAXSIM_QUERY_TEXT


def _vec_sql(tok: str) -> str:
    """DuckDB re-derivation of token_vector_expr(portable=True): char
    3-grams -> polynomial hash -> signed bucket fold -> L2 norm."""
    grams = (
        f"CASE WHEN length({tok}) < 3 THEN [{tok}] "
        f"ELSE list_transform(range(1, length({tok}) - 1), "
        f"i -> substr({tok}, CAST(i AS INT), 3)) END"
    )
    hashes = (
        f"list_transform({grams}, g -> list_reduce("
        f"list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length(g) + 1), "
        f"j -> CAST(ascii(g[CAST(j AS INT)]) AS BIGINT))), "
        f"(a, b) -> (a * 131 + b) % 2147483647))"
    )
    return (
        f"list_transform(range(0, {DIM}), d -> list_sum("
        f"list_transform({hashes}, h -> CASE WHEN h % {DIM} = d THEN "
        f"(CASE WHEN (h // 32768) % 2 = 1 THEN 1.0 ELSE -1.0 END) "
        f"ELSE 0.0 END)))"
    )


_NORM = (
    "CASE WHEN nrm <> 0 THEN list_transform(v, x -> x / nrm) ELSE v END"
)


def _maxsim_sql(query_text: str, k: int = 10) -> str:
    qlit = query_text.replace("'", "''")
    return f"""
    WITH d0 AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t <> '')[1:32] AS ts
      FROM documents WHERE text IS NOT NULL
    ),
    dt AS (SELECT doc_id, unnest(ts) AS tok FROM d0 WHERE len(ts) > 0),
    dvr AS (SELECT doc_id, {_vec_sql('tok')} AS v FROM dt),
    dv AS (
      SELECT doc_id, {_NORM} AS v
      FROM (SELECT doc_id, v,
                   sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
            FROM dvr)
    ),
    q0 AS (
      SELECT list_filter(string_split_regex(lower('{qlit}'), '\\s+'),
                         t -> t <> '')[1:32] AS qt
    ),
    qt AS (
      SELECT i AS qi, qt[CAST(i AS INT)] AS tok
      FROM q0, UNNEST(range(1, len(qt) + 1)) u(i)
    ),
    qvr AS (SELECT qi, {_vec_sql('tok')} AS v FROM qt),
    qv AS (
      SELECT qi, {_NORM} AS v
      FROM (SELECT qi, v,
                   sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
            FROM qvr)
    ),
    dots AS (
      SELECT d.doc_id, q.qi, list_dot_product(d.v, q.v) AS s
      FROM dv d CROSS JOIN qv q
    ),
    mx AS (SELECT doc_id, qi, MAX(s) AS m FROM dots GROUP BY doc_id, qi),
    sc AS (SELECT doc_id, ROUND(SUM(m), 6) AS score FROM mx GROUP BY doc_id)
    SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT {k}
    """


@pytest.fixture(scope="module")
def corpus(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return docs.withColumn(
        "token_vecs", multi_vector_expr("text", dim=DIM, max_tokens=32, portable=True)
    ).localCheckpoint()


def test_maxsim_search_matches_duckdb(spark):
    """The declared query == a full independent DuckDB re-derivation:
    tokens, char-3-gram polynomial hashes, signed bucket folds, norms,
    per-query-token maxes, the MaxSim sum, and the ranked top-10."""
    out = R.QUERIES["maxsim_search"](spark, SF_DIR)
    r = compare(out, duck_connection(SF_DIR), _maxsim_sql(QT))
    assert r["values_match"], r


def test_python_query_encoder_is_bit_exact(spark):
    """py_multi_vector (the driver-side lazy query encoder) must equal the
    corpus expression value-for-value — it feeds plan literals that the
    oracle recomputes independently."""
    txt = "fast hash join query over the part table plus xy q"
    row = spark.createDataFrame([(txt,)], "text string").select(
        multi_vector_expr("text", dim=DIM, max_tokens=32, portable=True).alias("mv")
    ).first()
    py = py_multi_vector(txt, dim=DIM, max_tokens=32)
    got = [[float(x) for x in tv] for tv in row["mv"]]
    assert py == got


def test_pruned_wide_equals_exact_and_token_table_reuse(spark, corpus):
    q = py_multi_vector(QT, dim=DIM, max_tokens=32)
    exact = [tuple(r) for r in maxsim_topk(corpus, q, k=10).collect()]
    wide = [
        tuple(r) for r in maxsim_topk_pruned(corpus, q, k=10, m=10**6).collect()
    ]
    assert wide == exact
    # a pre-built (persisted) token table is the same plan input
    tt = build_token_table(corpus).localCheckpoint()
    reused = [
        tuple(r)
        for r in maxsim_topk_pruned(corpus, q, k=10, m=10**6, token_table=tt).collect()
    ]
    assert reused == exact


def test_pruned_narrow_recall_floor(spark, corpus):
    """m=128 docs per query token must recover >= 8/10 of the exact
    top-10 — measured, not assumed.  The synthetic fixture is
    adversarial for candidate generation: its ~90-word vocabulary makes
    whole token CLASSES share one identical vector, so per-token dots
    tie across hundreds of documents and the tie-break (doc_id) decides
    who makes the top-m; real token embeddings (contextual, or over a
    real vocabulary) spread those ties.  m is sized against the
    tie-class width here, and the floor still proves the gather+rerank
    machinery loses nothing beyond stage-1 truncation."""
    q = py_multi_vector(QT, dim=DIM, max_tokens=32)
    exact = {r["doc_id"] for r in maxsim_topk(corpus, q, k=10).collect()}
    pruned = {
        r["doc_id"] for r in maxsim_topk_pruned(corpus, q, k=10, m=128).collect()
    }
    assert len(exact & pruned) >= 8, (exact, pruned)


def test_null_and_empty_docs_score_null_and_drop(spark):
    df = spark.createDataFrame(
        [(1, "real tokens here"), (2, None), (3, ""), (4, "   ")],
        "doc_id long, text string",
    ).withColumn("token_vecs", multi_vector_expr("text", dim=DIM, portable=True))
    mv = {r["doc_id"]: r["token_vecs"] for r in df.collect()}
    assert mv[2] is None and mv[3] is None and mv[4] is None
    q = py_multi_vector("tokens", dim=DIM)
    got = [r["doc_id"] for r in maxsim_topk(df, q, k=10).collect()]
    assert got == [1]


def test_exact_plan_is_take_ordered_no_shuffle(spark, corpus):
    q = py_multi_vector(QT, dim=DIM, max_tokens=32)
    plan = maxsim_topk(corpus, q, k=10)
    assert audit.uses_take_ordered(plan)
    assert audit.count_exchanges(plan) == 0


def test_pruned_plan_shuffle_budget(spark, corpus):
    """Stage 1 = the per-(qtoken, doc) max aggregate (map-side combining)
    + the salted two-level top-m (local window spread over 64 salts so
    k_q low-cardinality partitions never funnel the corpus, global
    window over m-bounded survivors); the candidate set broadcasts into
    the semi-join and the stage-2 finish is the same TakeOrdered as the
    exact path."""
    q = py_multi_vector(QT, dim=DIM, max_tokens=32)
    plan = maxsim_topk_pruned(corpus, q, k=10, m=32)
    assert audit.uses_take_ordered(plan)
    assert audit.uses_broadcast_join(plan)
    assert audit.count_exchanges(plan) <= 4


def test_pandas_twin_is_bit_identical_corpus_wide(spark):
    """multi_vector_pandas == multi_vector_expr(portable=True) over the
    ENTIRE fixture corpus (all languages): the Arrow-batched hot path and
    the oracle-documentation expression are the same function.  (The
    declared queries use the pandas twin: Catalyst has no CSE inside HOF
    lambdas, so scoring over the unmaterialized expression re-runs the
    construction per query-token reference — measured 120s vs 1.7s for
    identical results.)"""
    from vector_search_databricks_poc_spark.operators.multivec import (
        multi_vector_pandas,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    e = {
        r["doc_id"]: r["mv"]
        for r in docs.select(
            "doc_id",
            multi_vector_expr("text", dim=DIM, max_tokens=32, portable=True).alias("mv"),
        ).collect()
    }
    p = {
        r["doc_id"]: r["mv"]
        for r in docs.select(
            "doc_id",
            multi_vector_pandas("text", dim=DIM, max_tokens=32).alias("mv"),
        ).collect()
    }
    assert set(e) == set(p)
    for k in e:
        a, b = e[k], p[k]
        assert (a is None) == (b is None), k
        if a is not None:
            assert [list(x) for x in a] == [list(x) for x in b], k
