"""Training-data hygiene operators: PII redaction, corpus boilerplate
removal, benchmark decontamination (the scrub stages between raw crawl
and pretraining corpus)."""

from pyspark.sql import functions as F

import vector_search_databricks_poc_spark.operators.text as X


def test_redact_pii_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "write to john.doe+spam@example.co.uk or call (555) 123-4567"),
            (2, "server at 192.168.10.1 serves https://example.com/a?b=c pages"),
            (3, "ssn 123-45-6789 card 4111 1111 1111 1111 end"),
            (4, "clean text with plain numbers like 42 and 2024 stays intact"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["red"] for r in df.select(
        "doc_id", X.redact_pii("text").alias("red")).collect()}
    assert out[1] == "write to <EMAIL> or call <PHONE>"
    assert out[2] == "server at <IP> serves <URL> pages"
    assert out[3] == "ssn <SSN> card <CARD> end"
    assert out[4] == "clean text with plain numbers like 42 and 2024 stays intact"


def test_pii_stats_counts(spark):
    df = spark.createDataFrame(
        [(1, "a@b.com and c@d.org"), (2, "visit https://x.io now")],
        ["doc_id", "text"],
    )
    row = X.pii_stats(df).first()
    assert row["n_docs"] == 2
    assert row["email_hits"] == 2
    assert row["url_hits"] == 1
    assert row["ssn_hits"] == 0


def _boiler_corpus(spark):
    footer = "(c) 2026 MegaCorp - all rights reserved"
    nav = "home | products | about us | contact"
    rows = []
    for i in range(12):
        body = f"unique article body number {i} with its own words"
        rows.append((i, f"{nav}\n{body}\n{footer}"))
    rows.append((99, "a document with no boilerplate at all\njust content"))
    return spark.createDataFrame(rows, ["doc_id", "text"]), footer, nav


def test_boilerplate_lines_found(spark):
    df, footer, nav = _boiler_corpus(spark)
    bp = {r["line"]: r["n_docs"] for r in X.boilerplate_lines(df, min_docs=10).collect()}
    assert bp == {footer: 12, nav: 12}


def test_remove_boilerplate_preserves_order(spark):
    df, footer, nav = _boiler_corpus(spark)
    out = {r["doc_id"]: r["text"] for r in
           X.remove_boilerplate_lines(df, min_docs=10).collect()}
    assert out[3] == "unique article body number 3 with its own words"
    # untouched doc keeps both lines in order
    assert out[99] == "a document with no boilerplate at all\njust content"
    # every doc survives (removal edits text, never drops documents)
    assert len(out) == 13


def test_decontaminate_planted(spark):
    bench_q = "what is the capital of atlantis under the western sea today"
    corpus = spark.createDataFrame(
        [
            # verbatim leak: contains the full 13-gram (12 filler + bench text)
            (1, "leaked eval row: " + bench_q + " and some trailing words"),
            (2, "an unrelated training document about spark shuffles and joins"),
            # partial overlap below n=13 contiguous words: not contaminated
            (3, "what is the capital of france"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(bench_q,)], ["text"])
    bad = {r["doc_id"] for r in
           X.contaminated_ids(corpus, bench, n=8).collect()}
    assert bad == {1}
    kept = {r["doc_id"] for r in X.decontaminate(corpus, bench, n=8).collect()}
    assert kept == {2, 3}


def test_decontaminate_case_insensitive(spark):
    corpus = spark.createDataFrame(
        [(1, "The Quick Brown Fox Jumps Over The Lazy Dog Again Tonight")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog again tonight",)], ["text"]
    )
    assert X.contaminated_ids(corpus, bench, n=10).count() == 1


def test_canonical_dedup_unicode_equivalents(spark):
    """Composed vs decomposed encodings and case variants of the same
    visible text dedupe to the min-id row, which keeps its ORIGINAL text;
    genuinely different texts survive."""
    from vector_search_databricks_poc_spark.operators.text import canonical_dedup

    composed = "café au lait"          # é as U+00E9
    decomposed = "café au lait"       # e + combining acute
    rows = [
        (1, composed),
        (2, decomposed),        # unicode-equivalent dup of 1
        (3, "CAFÉ AU LAIT"),  # case variant of 1
        (4, "completely different"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.text for r in canonical_dedup(df, "doc_id", "text").collect()}
    assert set(out) == {1, 4}
    assert out[1] == composed  # survivor keeps original bytes
    assert "_canon" not in canonical_dedup(df, "doc_id", "text").columns


def test_canonical_dedup_strip_accents_option(spark):
    """With strip_accents=True, accented and unaccented forms merge; with
    the default they stay distinct."""
    from vector_search_databricks_poc_spark.operators.text import canonical_dedup

    rows = [(1, "résumé"), (2, "resume")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert canonical_dedup(df).count() == 2
    merged = canonical_dedup(df, strip_accents=True).collect()
    assert len(merged) == 1 and merged[0].doc_id == 1


def test_canonicalize_udf_null_safe(spark):
    from pyspark.sql import functions as F

    from vector_search_databricks_poc_spark.operators.text import (
        canonicalize_text_udf,
    )

    df = spark.createDataFrame([(1, None), (2, "AbC")], ["i", "t"])
    canon = canonicalize_text_udf()
    got = {r.i: r.c for r in df.select("i", canon(F.col("t")).alias("c")).collect()}
    assert got[1] is None and got[2] == "abc"


def test_bloom_decontamination_equals_exact_path(spark):
    """operators/bloom.py: the Bloom-guarded route must return EXACTLY the
    broadcast-exact contaminated-id set on the real fixture (false
    positives die in the verify semi-join; Bloom has no false negatives)."""
    from tests.conftest import SF_DIR
    from vector_search_databricks_poc_spark.operators.bloom import (
        bloom_contaminated_ids,
    )
    from vector_search_databricks_poc_spark.operators.text import contaminated_ids

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = d.where("doc_id < 5").select("text")
    exact = {r["doc_id"] for r in contaminated_ids(d, bench, n=13).collect()}
    bloom = {r["doc_id"] for r in bloom_contaminated_ids(d, bench, n=13).collect()}
    assert bloom == exact and len(exact) >= 5  # at least the bench docs


def test_bloom_decontamination_exact_even_with_tiny_noisy_bloom(spark):
    """Force heavy false-positive pressure (64-bit bloom, k=2) on planted
    data: candidates balloon but the verification join keeps the answer
    exact, and a clean doc is never flagged."""
    from vector_search_databricks_poc_spark.operators.bloom import (
        bloom_contaminated_ids,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
            (3, "alpha beta gamma delta epsilon zeta eta theta extra tail"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta",)], ["text"]
    )
    out = {
        r["doc_id"]
        for r in bloom_contaminated_ids(
            corpus, bench, n=8, m_bits=64, k=2
        ).collect()
    }
    assert out == {1, 3}


def test_bloom_empty_benchmark_flags_nothing(spark):
    from vector_search_databricks_poc_spark.operators.bloom import (
        bloom_contaminated_ids,
    )

    corpus = spark.createDataFrame(
        [(1, "some training document with plenty of words inside it")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([], "text string")
    assert bloom_contaminated_ids(corpus, bench, n=5).count() == 0


def test_bloom_registry_query_matches_exact_query(spark):
    """Registry-level value compare: bloom_decontamination's summary row
    equals benchmark_decontamination's on the same fixture."""
    from tests.conftest import SF_DIR
    from vector_search_databricks_poc_spark.queries_registry import QUERIES

    a = QUERIES["benchmark_decontamination"](spark, SF_DIR).collect()[0]
    b = QUERIES["bloom_decontamination"](spark, SF_DIR).collect()[0]
    assert a.asDict() == b.asDict()


# ---------------------------------------------------------------------------
# Gopher/RefinedWeb repetition signals + corpus paragraph dedup (r5)
# ---------------------------------------------------------------------------


def test_repetition_signals_hand_computed(spark):
    """Exact values on tiny docs worked out by hand (independent of the
    implementation's own arithmetic)."""
    df = spark.createDataFrame(
        [
            # 6 tokens, 2-grams: "a b" x3, "b a" x2 -> top = 3*len("a b")/len("a b a b a b")
            (1, "a b a b a b"),
            # duplicate lines: "x" twice of 3 lines -> dup_line_frac=2/3,
            # chars: 1+1 of 1+1+8 -> 2/10
            (2, "x\nx\nlongline"),
            (3, ""),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in X.repetition_signals(df).collect()}
    r1 = out[1]
    assert abs(r1["top_2gram_char_frac"] - 3 * 3 / 11) < 1e-9
    # every 2-gram occurs >1 time -> full coverage at n=2 is not measured
    # (we measure n=5): 6 tokens, 5-grams "a b a b a" and "b a b a b" each
    # once -> no duplicated 5-gram
    assert r1["dup_5gram_char_frac"] == 0.0
    r2 = out[2]
    assert r2["n_lines"] == 3
    assert abs(r2["dup_line_frac"] - 2 / 3) < 1e-9
    assert abs(r2["dup_line_char_frac"] - 2 / 10) < 1e-9
    for empty_id in (3, 4):
        r = out[empty_id]
        assert r["n_lines"] == 0 and r["dup_line_frac"] == 0.0
        assert r["top_2gram_char_frac"] == 0.0


def test_repetition_signals_loop_detection(spark):
    """A degenerate looping doc saturates the duplicate fractions; a clean
    doc stays at zero."""
    loop = ("spam please buy now " * 10).strip()
    clean = "every word in this sentence appears exactly once here"
    df = spark.createDataFrame([(1, loop), (2, clean)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in X.repetition_signals(df).collect()}
    assert out[1]["dup_5gram_char_frac"] == 1.0  # every 5-gram repeats
    assert out[1]["top_2gram_char_frac"] > 0.15
    assert out[2]["dup_5gram_char_frac"] == 0.0
    assert out[2]["dup_line_frac"] == 0.0


def test_repetition_signals_shape_columns(spark):
    df = spark.createDataFrame(
        [
            (1, "- item one\n- item two\nplain line"),
            (2, "read more... and then more…\nplain"),
            (3, "# tag # tag"),
            (4, "1 2 3 four"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in X.repetition_signals(df).collect()}
    assert abs(out[1]["bullet_line_frac"] - 2 / 3) < 1e-6
    # line 1 of doc 2 ends with '...'? no: it ends 'more…' -> yes ellipsis;
    # the first line ends with the ASCII '...' only if trailing - it is
    # 'read more... and then more…' ONE line ending with the unicode
    # ellipsis -> 1 of 2 lines
    assert abs(out[2]["ellipsis_line_frac"] - 1 / 2) < 1e-6
    assert abs(out[3]["symbol_word_ratio"] - 2 / 4) < 1e-6
    assert abs(out[4]["alpha_word_frac"] - 1 / 4) < 1e-6


def test_repetition_signals_duplicate_paragraphs(spark):
    text = "intro paragraph\n\nrepeated block\n\nrepeated block\n\nconclusion"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = X.repetition_signals(df).collect()[0]
    assert r["n_paras"] == 4
    assert abs(r["dup_para_frac"] - 2 / 4) < 1e-9
    chars = [len("intro paragraph"), len("repeated block"), len("repeated block"), len("conclusion")]
    assert abs(r["dup_para_char_frac"] - 2 * len("repeated block") / sum(chars)) < 1e-9


def test_paragraph_dedup_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "shared\n\nbody one"),
            (2, "shared\n\nbody two\n\nshared"),
            (3, "only unique"),
            (4, "shared"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in X.paragraph_dedup(df).collect()}
    assert out[1]["text"] == "shared\n\nbody one"
    assert out[1]["n_paras_kept"] == 2 and out[1]["n_paras_dropped"] == 0
    assert out[2]["text"] == "body two"
    assert out[2]["n_paras_kept"] == 1 and out[2]["n_paras_dropped"] == 2
    assert out[3]["text"] == "only unique"
    assert out[4]["text"] == ""
    assert out[4]["n_paras_kept"] == 0 and out[4]["n_paras_dropped"] == 1


def test_paragraph_dedup_null_and_empty_docs_survive(spark):
    df = spark.createDataFrame(
        [(1, "real paragraph"), (2, None), (3, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in X.paragraph_dedup(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["text"] == "" and out[3]["text"] == ""
    assert out[1]["text"] == "real paragraph"


def _url_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "http://good.example.com/page"),
            (2, "https://ads.tracker.net/pixel"),
            (3, "https://sub.deep.ads.tracker.net/x"),  # subdomain of blocked
            (4, "http://nottracker.net/fine"),          # suffix is NOT a label match
            (5, "https://tracker.net.safe.org/ok"),     # blocked name mid-host
            (6, "not a url at all"),                    # no host -> kept
            (7, "http://casino-spam.biz/win?q=1"),
        ],
        ["doc_id", "url"],
    )


def test_url_filter_literal_blocklist_subdomain_semantics(spark):
    out = X.url_filter(_url_corpus(spark), ["tracker.net", "casino-spam.biz"])
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 4, 5, 6]


def test_url_filter_literal_path_has_no_shuffle(spark):
    from vector_search_databricks_poc_spark.plans.audit import count_exchanges

    out = X.url_filter(_url_corpus(spark), ["tracker.net"])
    assert count_exchanges(out) == 0


def test_url_filter_dataframe_blocklist_matches_literal(spark):
    corpus = _url_corpus(spark)
    blocked = ["tracker.net", "casino-spam.biz"]
    lit_ids = sorted(r["doc_id"] for r in X.url_filter(corpus, blocked).collect())
    bl_df = spark.createDataFrame([(d,) for d in blocked], ["domain"])
    df_ids = sorted(r["doc_id"] for r in X.url_filter(corpus, bl_df).collect())
    assert lit_ids == df_ids == [1, 4, 5, 6]


def test_url_filter_patterns_and_empty_blocklist(spark):
    corpus = _url_corpus(spark)
    # pattern-only: regex over the full url
    out = X.url_filter(corpus, [], blocked_patterns=(r"casino|pixel",))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3, 4, 5, 6]
    # nothing blocked -> identity
    assert X.url_filter(corpus, []).count() == corpus.count()


def test_url_filter_case_insensitive_hosts(spark):
    df = spark.createDataFrame(
        [(1, "http://ADS.Tracker.NET/x"), (2, "http://ok.org/y")],
        ["doc_id", "url"],
    )
    out = X.url_filter(df, ["TRACKER.net"])
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_quality_gate_and_url_filter_tolerate_reserved_colnames(spark):
    """r6 (r5 ADVICE): operators that stash temporaries on the user's
    frame must not collide with real columns named _sig / _host."""
    df = spark.createDataFrame(
        [(1, "hello world text here", "user-sig-1", "user-host-1"),
         (2, "another document body", "user-sig-2", "user-host-2")],
        ["doc_id", "text", "_sig", "_host"],
    )
    gated = X.quality_gate(df)
    rows = {r["doc_id"]: r for r in gated.collect()}
    assert set(gated.columns) == {"doc_id", "text", "_sig", "_host", "keep", "drop_reasons"}
    assert rows[1]["_sig"] == "user-sig-1"  # user's column survives untouched

    urls = spark.createDataFrame(
        [(1, "http://blocked.net/a", "mine-1"), (2, "http://ok.org/b", "mine-2")],
        ["doc_id", "url", "_host"],
    )
    bl = spark.createDataFrame([("blocked.net",)], ["domain"])
    kept = X.url_filter(urls, bl)
    out = {r["doc_id"]: r["_host"] for r in kept.collect()}
    assert out == {2: "mine-2"}  # filtered on the URL host, column preserved
