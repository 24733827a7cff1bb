"""BPE tokenizer tests (functions/bpe.py): hand-computed golden merges,
canonical encode behavior, Spark-vs-driver parity, and the declared query.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.functions.bpe import (
    _EOW,
    bpe_encode_udf,
    bpe_token_count,
    encode_word,
    train_bpe,
    train_bpe_merges,
    word_counts,
)

# the classic Sennrich corpus: low x5, lower x2, newest x6, widest x3
_CLASSIC = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_golden_merges_classic_corpus():
    """First merges hand-derived: (e,s)/(es,t)/(est,EOW) at count 9 with
    lexicographic tie-breaks, then (l,o)/(lo,w) at 7, then (e,w) at 6."""
    merges = train_bpe_merges(_CLASSIC, num_merges=6)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", _EOW),
        ("l", "o"), ("lo", "w"), ("e", "w"),
    ]


def test_encode_word_canonical():
    merges = train_bpe_merges(_CLASSIC, num_merges=6)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est" + _EOW]
    assert encode_word("low", ranks) == ["low", _EOW]  # (low,EOW) not merged yet
    assert encode_word("zzz", ranks) == ["z", "z", "z", _EOW]  # OOV -> chars
    more = train_bpe_merges(_CLASSIC, num_merges=20)
    ranks20 = {p: i for i, p in enumerate(more)}
    assert encode_word("low", ranks20) == ["low" + _EOW]  # fully merged later


def test_spark_training_matches_python_reference(spark):
    rows = [(i, t) for i, t in enumerate(
        ["low low lower", "newest newest newest widest",
         "low low low newest newest newest widest widest lower"]
    )]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    counts = Counter()
    for _, t in rows:
        counts.update(t.split())
    expected = train_bpe_merges(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])),
                                num_merges=6)
    assert train_bpe(df, num_merges=6) == expected
    assert expected == train_bpe_merges(_CLASSIC, num_merges=6)  # same corpus


def test_encode_udf_matches_driver_encoding(spark):
    merges = train_bpe_merges(_CLASSIC, num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    rows = [(1, "lowest newest widest"), (2, "low unseen"), (3, None), (4, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    enc = bpe_encode_udf(merges)
    got = {r["doc_id"]: r["toks"] for r in df.select("doc_id", enc("text").alias("toks")).collect()}
    for i, t in rows:
        if t is None:
            assert got[i] is None
        else:
            exp = [s for w in t.split() for s in encode_word(w, ranks)]
            assert got[i] == exp, (i, got[i], exp)
    n = df.where(F.col("doc_id") == 1).select(
        bpe_token_count(df, merges).alias("n")
    ).first()["n"]
    assert n == len(got[1])


def test_word_counts_cap_is_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c")], ["doc_id", "text"]
    )
    assert word_counts(df, max_words=2) == [("b", 3), ("a", 2)]
    # count tie breaks by word
    df2 = spark.createDataFrame([(1, "b a b a")], ["doc_id", "text"])
    assert word_counts(df2, max_words=1) == [("a", 2)]


def test_declared_bpe_query(spark):
    from vector_search_databricks_poc_spark import queries_registry as R

    out = R.QUERIES["bpe_tokenize"](spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] > 0 and r["total_bpe_tokens"] > 0
    # subword tokens are never fewer than words and each word adds >=1
    assert r["total_bpe_tokens"] >= r["total_words"]
    assert r["distinct_bpe_tokens"] > 0
