"""DSIR importance resampling (operators/dsir.py).

Correctness model: the whole pipeline — hashed n-gram features, smoothed
log-likelihood-ratio bucket weights, per-doc scores, Gumbel top-k
selection — is re-derived independently in DuckDB SQL over the same
parquet, and compared per-doc with a float tolerance (ln() may differ in
the last ulp across engines; everything else is integer-exact).  The
Arrow literal-path scorer is compared bit-exactly against the join-path
scorer (same engine, same arithmetic)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.oracle_utils import duck_connection
from vector_search_databricks_poc_spark.operators import dsir as D

B = 512  # small bucket count → heavy collisions → exercises the hash math
NS = (1, 2)
S = 1.0  # smoothing
TARGET_LANG = "fr"

_POLY = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, length(g) + 1), i -> CAST(ascii(g[i]) AS BIGINT))), "
    "(a, b) -> (a * 131 + b) % 2147483647)"
)

_SCORES_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\r\f\x0b]+'),
                     t -> t != '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, lang,
         list_concat(t, list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i+1])) AS gs
  FROM toks
),
feats AS (
  SELECT doc_id, lang, {_POLY} % {B} AS b
  FROM (SELECT doc_id, lang, unnest(gs) AS g FROM grams)
),
rc AS (SELECT b, COUNT(*) AS c FROM feats GROUP BY b),
tc AS (SELECT b, COUNT(*) AS c FROM feats WHERE lang = '{TARGET_LANG}' GROUP BY b),
dense AS (
  SELECT r.range AS b,
         COALESCE(rc.c, 0) AS rcc, COALESCE(tc.c, 0) AS tcc
  FROM range(0, {B}) r
  LEFT JOIN rc ON rc.b = r.range LEFT JOIN tc ON tc.b = r.range
),
w AS (
  SELECT b,
         ln((tcc + {S}) / ((SELECT SUM(tcc) FROM dense) + {S} * {B}))
       - ln((rcc + {S}) / ((SELECT SUM(rcc) FROM dense) + {S} * {B})) AS w
  FROM dense
),
scored AS (
  SELECT f.doc_id, SUM(w.w) AS score
  FROM feats f JOIN w ON w.b = f.b GROUP BY f.doc_id
)
SELECT d.doc_id, COALESCE(s.score, 0.0) AS score
FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
"""


def _duck_scores() -> dict[int, float]:
    con = duck_connection(SF_DIR)
    return {int(r[0]): float(r[1]) for r in con.sql(_SCORES_SQL).fetchall()}


@pytest.fixture(scope="module")
def fitted(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    target = docs.where(F.col("lang") == TARGET_LANG)
    wdf = D.dsir_bucket_weights(docs, target, buckets=B, ns=NS, smoothing=S)
    return docs, target, wdf


def test_scores_match_duckdb_rederivation(spark, fitted):
    docs, _target, wdf = fitted
    got = {
        int(r["doc_id"]): float(r["dsir_score"])
        for r in D.dsir_scores(docs, wdf, buckets=B, ns=NS).collect()
    }
    want = _duck_scores()
    assert set(got) == set(want)
    worst = max(abs(got[k] - want[k]) for k in got)
    assert worst < 1e-5, f"max score delta {worst}"


def test_literal_scorer_bit_exact_vs_join_path(spark, fitted):
    docs, _target, wdf = fitted
    wl = D.collect_bucket_weights(wdf, B)
    a = {r["doc_id"]: r["dsir_score"] for r in D.dsir_scores(docs, wdf, buckets=B, ns=NS).collect()}
    b = {r["doc_id"]: r["dsir_score"] for r in D.dsir_scores_literal(docs, wl, ns=NS).collect()}
    assert a == b  # same engine + same fold order after round(…, 6) → exact


def test_select_matches_independent_topk(spark, fitted):
    """Spark's Gumbel top-n == Python top-n over the DuckDB scores with
    the same deterministic Gumbel formula."""
    docs, target, _ = fitted
    n, temp = 40, 1.0
    sel = D.dsir_select(docs, target, n=n, buckets=B, ns=NS, smoothing=S,
                        temperature=temp)
    got = [(r["doc_id"], r["gumbel_key"]) for r in sel.collect()]
    assert len(got) == n

    p, mix = 2147483647, 2654435761
    def gumbel(i: int) -> float:
        u = ((i % p) * mix % p + 0.5) / p
        return -math.log(-math.log(u))

    want = sorted(
        ((did, round(round(s, 6) / temp + gumbel(did), 6))
         for did, s in _duck_scores().items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:n]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert all(abs(a - b) < 1e-5 for (_, a), (_, b) in zip(got, want))


def test_empty_and_null_docs_score_zero(spark, fitted):
    _docs, _target, wdf = fitted
    e = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   "), (4, "plain words here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["dsir_score"] for r in D.dsir_scores(e, wdf, buckets=B, ns=NS).collect()}
    assert got[1] == 0.0 and got[2] == 0.0 and got[3] == 0.0
    assert got[4] != 0.0


def test_target_lookalikes_outscore_rest(spark, fitted):
    """Semantic sanity: the mean score of the target language's own docs
    must exceed the mean over everything else (that's the entire point of
    the importance weights)."""
    docs, _target, wdf = fitted
    scored = D.dsir_scores(docs, wdf, buckets=B, ns=NS).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    rows = scored.groupBy(F.col("lang") == TARGET_LANG).agg(
        F.avg("dsir_score").alias("m")
    ).collect()
    means = {bool(r[0]): float(r["m"]) for r in rows}
    assert means[True] > means[False] + 1.0


def test_deterministic_across_repartition(spark, fitted):
    docs, target, _ = fitted
    a = D.dsir_select(docs, target, n=25, buckets=B, ns=NS).collect()
    b = D.dsir_select(docs.repartition(13), target.repartition(7), n=25,
                      buckets=B, ns=NS).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]


def test_guards(spark, fitted):
    docs, target, wdf = fitted
    with pytest.raises(ValueError):
        D.dsir_select(docs, target, n=0, buckets=B)
    with pytest.raises(ValueError):
        D.dsir_select(docs, target, n=5, buckets=B, temperature=0.0)
    with pytest.raises(ValueError):
        D.dsir_bucket_weights(docs, target, buckets=B, smoothing=0.0)
