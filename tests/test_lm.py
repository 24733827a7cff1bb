"""N-gram LM perplexity tests (operators/lm.py): hand-computed scoring,
training-count parity with a pure-Python reference, planted separation,
shuffle-free filter plan, and the declared query.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.lm import (
    UNK,
    NgramLM,
    logppl_udf,
    perplexity_filter,
    train_ngram_lm,
)


def test_doc_logppl_hand_computed():
    """Corpus 'a b a b c': uni a:2 b:2 c:1 (total 5); bi (a,b):2 (b,a):1
    (b,c):1.  Doc 'a b c' scores -(ln(2/5) + ln(2/2) + ln(1/2))/3."""
    m = NgramLM({"a": 2, "b": 2, "c": 1}, {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1}, 5)
    got = m.doc_logppl(["a", "b", "c"])
    exp = -(math.log(2 / 5) + math.log(1.0) + math.log(1 / 2)) / 3
    assert got == pytest.approx(exp, abs=1e-12)
    # unseen bigram backs off: 'c a' -> P(c)=1/5 then 0.4 * 2/5
    got2 = m.doc_logppl(["c", "a"])
    exp2 = -(math.log(1 / 5) + math.log(0.4 * 2 / 5)) / 2
    assert got2 == pytest.approx(exp2, abs=1e-12)
    assert m.doc_logppl([]) is None


def test_training_matches_python_counts(spark):
    rows = [(1, "a b a b c"), (2, "a b x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    m = train_ngram_lm(df, max_vocab=3, max_bigrams=100)
    # top-3 vocab: a:3 b:3 x... counts: a3 b3 c1 x1 -> cap 3 keeps a,b,c
    # (ties break by token: c < x), x folds into UNK
    assert m.unigrams == {"a": 3, "b": 3, "c": 1, UNK: 1}
    assert m.total == 8
    toks = [t for _, s in rows for t in s.split()]
    mapped = [t if t in {"a", "b", "c"} else UNK for t in toks]
    # bigrams per doc (not across docs)
    exp_bi = Counter()
    for _, s in rows:
        ms = [t if t in {"a", "b", "c"} else UNK for t in s.split()]
        exp_bi.update(zip(ms, ms[1:]))
    assert m.bigrams == dict(exp_bi)
    assert mapped  # silence linters


def test_udf_matches_driver_scoring(spark):
    d = load_table(spark, SF_DIR, "documents").where(F.col("doc_id") < 80)
    model = train_ngram_lm(d, max_vocab=5000, max_bigrams=50_000)
    lp = logppl_udf(model)
    rows = d.select("doc_id", "text", lp(F.col("text")).alias("lp")).collect()
    import re
    from vector_search_databricks_poc_spark.operators.text import TOKEN_SPLIT_REGEX

    sp = re.compile(TOKEN_SPLIT_REGEX)
    for r in rows:
        exp = model.doc_logppl([t for t in sp.split(r["text"]) if t])
        assert r["lp"] == pytest.approx(exp, abs=1e-12)


def test_gibberish_scores_less_fluent_and_filter_is_shuffle_free(spark):
    from vector_search_databricks_poc_spark.plans import audit as A

    d = load_table(spark, SF_DIR, "documents")
    model = train_ngram_lm(d.where(F.col("doc_id") < 200))
    held = d.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 280))
    gib = F.array_join(
        F.transform(
            F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""),
            lambda t: F.substring(F.hex(F.xxhash64(t)), 1, 8),
        ),
        " ",
    )
    lp = logppl_udf(model)
    nat = [r["lp"] for r in held.select(lp(F.col("text")).alias("lp")).collect()]
    bad = [r["lp"] for r in held.select(lp(gib).alias("lp")).collect()]
    assert max(nat) < min(bad)  # full separation on planted gibberish

    cut = (max(nat) + min(bad)) / 2
    kept = perplexity_filter(held, model, max_logppl=cut)
    assert kept.count() == len(nat)
    assert A.count_exchanges(perplexity_filter(held, model, cut)) == 0


def test_declared_lm_query(spark):
    from vector_search_databricks_poc_spark import queries_registry as R

    out = {r["cls"]: r for r in R.QUERIES["lm_perplexity"](spark, SF_DIR).collect()}
    assert set(out) == {"crawl", "ref"}
    assert out["crawl"]["avg_logppl"] > out["ref"]["avg_logppl"] + 1.0
    assert out["crawl"]["min_logppl"] > out["ref"]["avg_logppl"]
