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


def test_vocab_is_deterministic_and_complete():
    from vector_search_databricks_poc_spark.functions.bpe import (
        EOS_ID, UNK_ID, bpe_vocab, encode_word, train_bpe_merges,
    )

    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_merges(counts, num_merges=10)
    vocab = bpe_vocab(counts, merges)
    assert vocab == bpe_vocab(counts, merges)
    assert EOS_ID == 0 and UNK_ID == 1
    assert min(vocab.values()) == 2 and len(set(vocab.values())) == len(vocab)
    # every symbol the encoder can emit for a TRAINED word is in-vocab
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in counts:
        for sym in encode_word(w, ranks):
            assert sym in vocab, sym


def test_encode_ids_udf_matches_string_path(spark):
    from pyspark.sql import functions as F

    from vector_search_databricks_poc_spark.functions.bpe import (
        UNK_ID, bpe_encode_ids_udf, bpe_encode_udf, bpe_vocab, train_bpe,
        word_counts,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
        F.col("doc_id") < 80
    )
    counts = word_counts(d, max_words=2000)
    merges = train_bpe(d, num_merges=80, max_words=2000)
    vocab = bpe_vocab(counts, merges)
    enc_s = bpe_encode_udf(merges)
    enc_i = bpe_encode_ids_udf(merges, vocab)
    rows = d.select(
        "doc_id", enc_s(F.col("text")).alias("toks"), enc_i(F.col("text")).alias("ids")
    ).collect()
    assert rows
    for r in rows:
        assert [vocab.get(t, UNK_ID) for t in r["toks"]] == list(r["ids"])


def test_bpe_ids_pack_composition(spark):
    """Train -> encode to ids -> pack: the packed stream reassembles to
    exactly the concatenated per-group encoded streams (eos between
    docs), proving the two operators compose loss-free."""
    from pyspark.sql import functions as F

    from vector_search_databricks_poc_spark.functions.bpe import (
        EOS_ID, bpe_encode_ids_udf, bpe_vocab, train_bpe, word_counts,
    )
    from vector_search_databricks_poc_spark.operators.packing import pack_token_ids

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
        F.col("doc_id") < 60
    ).select("doc_id", "text")
    counts = word_counts(d, max_words=2000)
    merges = train_bpe(d, num_merges=60, max_words=2000)
    enc = bpe_encode_ids_udf(merges, bpe_vocab(counts, merges))
    docs = d.select("doc_id", enc(F.col("text")).alias("input_ids"))
    packed = pack_token_ids(docs, budget=64, n_groups=2, eos_id=EOS_ID,
                            drop_last=False)

    got: dict[int, dict[int, list[int]]] = {}
    for r in packed.collect():
        g, c = divmod(int(r["seq_id"]), 1 << 43)
        got.setdefault(g, {})[c] = list(r["input_ids"])
    P31, MIX = 2147483647, 2654435761
    want: dict[int, list[int]] = {0: [], 1: []}
    for r in sorted(docs.collect(), key=lambda r: r["doc_id"]):
        g = (int(r["doc_id"]) % P31) * MIX % P31 % 2
        want[g].extend(list(r["input_ids"]) + [EOS_ID])
    for g in (0, 1):
        stream = [t for _, seq in sorted(got.get(g, {}).items()) for t in seq]
        assert stream == want[g]


def test_decode_ids_round_trip(spark):
    """decode(encode(text)) == whitespace-normalized text whenever every
    word is drawn from the training corpus (no UNK); UNK and EOS render
    visibly/as boundaries."""
    import pandas as pd

    from vector_search_databricks_poc_spark.functions.bpe import (
        EOS_ID, UNK_ID, bpe_decode_ids_udf, bpe_encode_ids_udf, bpe_vocab,
        train_bpe, word_counts,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
        F.col("doc_id") < 80
    ).select("doc_id", "text")
    counts = word_counts(d, max_words=5000)
    merges = train_bpe(d, num_merges=120, max_words=5000)
    vocab = bpe_vocab(counts, merges)
    enc = bpe_encode_ids_udf(merges, vocab)
    dec = bpe_decode_ids_udf(vocab)
    rows = d.select(
        "text", dec(enc(F.col("text"))).alias("round")
    ).collect()
    assert rows
    for r in rows:
        # training covered every char of these docs -> exact reconstruction
        assert r["round"] == " ".join(r["text"].split()), r["round"][:80]

    # EOS inside a packed stream is a word boundary; unknown id is visible
    probe = spark.createDataFrame(
        [([vocab["l" + "o" + "w" + "▁"], EOS_ID,
           vocab["l" + "o" + "w" + "▁"]],),
         ([UNK_ID],), (None,)],
        "ids array<int>",
    ) if "low▁" in vocab else None
    if probe is not None:
        got = [r["t"] for r in probe.select(dec(F.col("ids")).alias("t")).collect()]
        assert got[0] == "low low"
        assert got[1] == "�"
        assert got[2] is None
