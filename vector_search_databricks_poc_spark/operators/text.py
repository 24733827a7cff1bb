"""Text-analysis operators (SURVEY.md B2/B12; north-star "text analysis").

Everything here is a pure Catalyst expression — no Python UDFs — so the
whole suite stays inside whole-stage codegen and scales linearly with the
corpus.  The reference's only text processing is driver-side Python string
cleanup during arXiv ingest (syntetic_data_arxiv.py:87-105); these operators
re-express that surface (and the LLM-pipeline extensions) over a ``text``
column of any width.

One exception: Unicode canonicalization (``canonicalize_text_udf``) — NFC/
casefold has no Catalyst builtin, so it is an Arrow-vectorized pandas_udf
(pandas' C-backed str methods, never per-row Python).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Paragraph boundary: a run of 2+ newlines.  ONE definition shared by the
# Python-side repetition signals and the Catalyst-side paragraph_dedup
# split so the two operators agree on what a "paragraph" is.
_BLANK_LINE_RUN = re.compile(r"\n{2,}")
PARA_SPLIT_REGEX = r"\n{2,}"

# THE whitespace definition for the repetition-signal family, stated once
# in both dialects.  Java's \s is ASCII-only while Python's str.split()/
# str.strip() are Unicode-aware (U+00A0 etc.), so letting each layer use
# its native default silently computes the expression-side shape ratios
# and the udf-side repetition fractions over DIFFERENT token/line bases
# on real crawled text.  Both layers use this explicit ASCII class; a
# Unicode-space-glued token is then one token in BOTH layers.
_WS_CHARS = " \t\n\r\f\v"  # Python strip()/split set
_WS_CLASS = r"[ \t\n\r\f\x0B]"  # the identical Java regex class
TOKEN_SPLIT_REGEX = _WS_CLASS + "+"
_TOKEN_SPLIT_RE = re.compile(TOKEN_SPLIT_REGEX)


def _ws_trim(c: Column) -> Column:
    """Trim ALL leading/trailing ASCII whitespace (tabs, stray newlines),
    not just spaces — ``F.trim`` strips only ' ', but the Python-side
    signal udf strips the same ``_WS_CHARS`` set; the two layers must
    agree on what an empty line/paragraph is."""
    return F.regexp_replace(c, f"^{_WS_CLASS}+|{_WS_CLASS}+$", "")

# Tiny multilingual stopword list used by the quality score; deliberately
# deterministic and engine-local (no external model).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization with empty-token removal (matches DuckDB
    ``list_filter(string_split(text, ' '), t -> t != '')``)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda t: t != "")


def collapse_whitespace(text: Column | str) -> Column:
    """Trim + collapse whitespace runs to one space — THE cleaning
    expression every pipeline entry uses (one definition; it was
    copy-pasted into three call sites before r4)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


def avg_token_length(text: Column | str) -> Column:
    """Mean token length in characters (NULL on token-free text)."""
    t = tokens(text)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(t) > 0, total.cast("double") / F.size(t))


def stopword_ratio(text: Column | str, stopwords=STOPWORDS) -> Column:
    t = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0, n_sw.cast("double") / F.size(t))


def whitespace_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    spaces = F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit("")))
    return F.when(F.length(c) > 0, spaces.cast("double") / F.length(c))


def quality_score(text: Column | str) -> Column:
    """Composite heuristic quality score in [0,1]: length sweet-spot,
    stopword presence, token-length sanity.  Deterministic; the LLM-pipeline
    'keep or drop' signal."""
    tc = token_count(text)
    length_ok = F.when((tc >= 5) & (tc <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = F.coalesce(stopword_ratio(text), F.lit(0.0))
    sw_ok = F.when((sw > 0.0) & (sw < 0.8), F.lit(1.0)).otherwise(F.lit(0.0))
    atl = F.coalesce(avg_token_length(text), F.lit(0.0))
    atl_ok = F.when((atl >= 2.0) & (atl <= 15.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (length_ok + sw_ok + atl_ok) / F.lit(3.0)


def strip_html(text: Column | str) -> Column:
    """Strip HTML markup for corpus prep — tags, script/style blocks, and
    the common entities — as pure regexp expressions (codegen, no UDF).
    Not a full parser: malformed nesting degrades to leftover text, never
    an error, which is the right failure mode mid-pipeline at scale."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    # &amp; decodes LAST: doing it first would double-unescape
    # double-escaped entities ('&amp;lt;' means the literal text '&lt;',
    # not '<') — the classic entity-decode-order bug
    for ent, rep in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return collapse_whitespace(c)


def repetition_ratio(text: Column | str, n: int = 3) -> Column:
    """Fraction of duplicated word n-grams in the document (the
    Gopher/C4-style repetition signal: boilerplate and degenerate text
    repeat themselves).  0 = all n-grams distinct; near 1 = the same
    phrase looping.  Pure expressions (shingle array -> distinct ratio)."""
    from .dedup import shingles

    sh = shingles(text, n)
    total = F.size(sh)
    return F.when(
        total > 0, 1.0 - F.size(F.array_distinct(sh)).cast("double") / total
    ).otherwise(F.lit(0.0))


def unigram_logprob_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram log-probability under the CORPUS unigram
    distribution — the model-free cousin of perplexity filtering: gibberish
    and off-distribution documents score low because their tokens are rare
    in the corpus.

    Two-pass, both distributed: (1) corpus term frequencies (one shuffle on
    term), (2) explode docs -> join term logprobs -> re-aggregate per doc
    (shuffles on term and id).  Laplace-smoothed so unseen terms are finite.
    Returns (id_col, n_tokens, avg_logprob).
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
    freqs = tok.groupBy("term").agg(F.count("*").alias("tf"))
    totals = freqs.agg(
        F.sum("tf").cast("double").alias("_total"), F.count("*").cast("double").alias("_vocab")
    )
    lp = freqs.crossJoin(F.broadcast(totals)).select(
        "term",
        F.log((F.col("tf") + 1.0) / (F.col("_total") + F.col("_vocab"))).alias("_lp"),
    )
    return (
        tok.join(lp, "term")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("_lp"), 6).alias("avg_logprob"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token-window passages — the RAG
    ingestion step between cleanup and embedding (the reference embeds
    whole documents; real corpora need passage granularity for retrieval).

    Pure expressions: token array -> sequence of window starts (stride =
    chunk_tokens - overlap) -> posexplode of sliced windows.  Output:
    (id_col, chunk_seq, chunk_text, n_chunk_tokens); chunk ids are
    deterministic (position order), so chunking is reproducible across
    runs and engines.  Each source row fans out independently — no
    shuffle, the explode pipelines into whatever follows.
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    t = tokens(text_col)
    n = F.size(t)
    # window starts: 0, stride, 2*stride, ... while start < n (and always
    # at least one chunk, even for empty/short docs)
    last_start = F.greatest((n - 1), F.lit(0)) - F.pmod(F.greatest((n - 1), F.lit(0)), F.lit(stride))
    # clamp: a final window that would be pure overlap (fully contained in
    # the previous one) is dropped by capping starts at n - overlap - 1
    starts = F.filter(
        F.sequence(F.lit(0), last_start, F.lit(stride)),
        lambda s: (s == 0) | (s + F.lit(overlap) < n),
    )
    chunks = F.transform(starts, lambda s: F.slice(t, s + 1, chunk_tokens))
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_seq", "_ctoks"),
    ).select(
        id_col,
        "chunk_seq",
        F.concat_ws(" ", "_ctoks").alias("chunk_text"),
        F.size("_ctoks").alias("n_chunk_tokens"),
    )


def language_filter(df: DataFrame, langs: list[str], lang_col: str = "lang") -> DataFrame:
    return df.where(F.col(lang_col).isin(langs))


def lang_id_heuristic(text: Column | str) -> Column:
    """N-gram-free language-ID heuristic: pick the language whose marker
    stopwords appear most often.  A deterministic stand-in for a real
    langid model (the real model would be a pandas_udf, B22)."""
    markers = {
        "en": ("the", "and", "of"),
        "es": ("el", "la", "de"),
        "fr": ("le", "la", "et"),
        "de": ("der", "die", "und"),
    }
    t = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    best = F.lit("und")
    best_n = F.lit(0)
    for lang, words in markers.items():
        arr = F.array(*[F.lit(w) for w in words])
        n = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
        best = F.when(n > best_n, F.lit(lang)).otherwise(best)
        best_n = F.when(n > best_n, n).otherwise(best_n)
    return best


def term_frequencies(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus-wide term frequency: explode tokens -> groupBy(token).count().
    Map-side partial aggregation makes this a single shuffle of distinct
    terms, not of token instances."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= min_count)
    )


def keyword_search(df: DataFrame, keyword: str, text_col: str = "text") -> DataFrame:
    return df.where(F.col(text_col).contains(keyword))


BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def regex_tokens(text: Column | str, pattern: str = BPE_ISH_PATTERN) -> Column:
    """BPE-ish tokenization: letter runs, single digits, single punctuation —
    the shape GPT-style byte-pair pre-tokenizers produce (digits split,
    punctuation isolated).  A deterministic stand-in for a real BPE vocab;
    token COUNTS from this are the cost-estimation signal for LLM pipelines."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(pattern), 0)


def bpe_token_count(text: Column | str, pattern: str = BPE_ISH_PATTERN) -> Column:
    return F.size(regex_tokens(text, pattern))


def fingerprint(text: Column | str, mod: int = 2**31 - 1) -> Column:
    """Deterministic document fingerprint: polynomial rolling hash over
    token first-characters and lengths, exactly expressible in both Spark
    and ANSI SQL (no engine-specific hash function).

    fp = fold(tokens, 0, (acc, tok) -> (acc*31 + ascii(substr(tok,1,1))*7
                                        + length(tok)) % mod)
    """
    t = tokens(text)
    return F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, tok: (acc * 31 + F.ascii(F.substring(tok, 1, 1)) * 7 + F.length(tok))
        % F.lit(mod).cast("long"),
    )


# ---------------------------------------------------------------------------
# Training-data hygiene: PII redaction, boilerplate removal, decontamination
# ---------------------------------------------------------------------------


def url_host(url: Column | str) -> Column:
    """Lowercased host part of a URL (empty string when there is none).

    Userinfo (``user:pass@host``) and trailing dots (``host.``) are
    stripped — both are classic blocklist-evasion shapes
    (``http://evil@tracker.net/x`` must still match ``tracker.net``)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_replace(
            F.regexp_extract(
                c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1
            ),
            r"\.+$",
            "",
        )
    )


def _free_colname(df: DataFrame, base: str) -> str:
    """A temp-column name guaranteed absent from ``df`` — operators that
    stash intermediates on the USER'S frame (quality_gate's signal
    struct, url_filter's host) must not collide with a real column of
    the same name (ambiguous-reference error, or a silently wrong
    join/drop)."""
    name = base
    i = 0
    while name in df.columns:
        i += 1
        name = f"{base}__{i}"
    return name


def _host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host: a.b.co -> [a.b.co, b.co, co] — the
    match set for subdomain-inclusive blocking, bounded by label count
    (crawl hosts have ~2-6 labels), no per-domain regex ever."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.array_join(F.slice(parts, i, n), ".")
    )


def url_filter(
    df: DataFrame,
    blocked_domains: "list[str] | DataFrame" = (),
    url_col: str = "url",
    blocked_patterns: tuple[str, ...] = (),
    domain_df_col: str = "domain",
) -> DataFrame:
    """C4/RefinedWeb-style URL filtering: drop rows whose URL host is a
    blocked domain OR any subdomain of one, or whose full URL matches a
    blocked regex pattern.  Keeps everything else, including rows with no
    parseable host (filtering is a blocklist, not an allowlist).

    Two scale regimes, chosen by the blocklist's type:

    - ``list``/tuple (≤ ~10^5 domains): the blocklist folds into the plan
      as a literal array and matching is ``arrays_overlap`` over the
      host's dot-suffixes — pure codegen expressions, ZERO shuffles, the
      corpus never moves.
    - ``DataFrame`` (UT1-class lists run to millions of rows): suffixes
      explode per row and semi-join the blocklist on the suffix; the
      blocklist side broadcasts (a few MBs of strings) so the corpus
      still never shuffles — matched row ids return via the exploded
      frame's anti-join on (row-local) url + host, exact because a URL
      maps to one host deterministically.
    """
    host = url_host(F.col(url_col))
    out = df
    if blocked_patterns:
        pat = "|".join(f"(?:{p})" for p in blocked_patterns)
        out = out.where(~F.coalesce(F.col(url_col).rlike(pat), F.lit(False)))
    if isinstance(blocked_domains, DataFrame):
        bl = blocked_domains.select(
            F.lower(F.col(domain_df_col)).alias("_bl_domain")
        ).distinct()
        # match on distinct hosts (cardinality << corpus), then drop by
        # host equality — the corpus side stays un-exploded and unshuffled
        hname = _free_colname(out, "_host")  # collision-safe on the user's frame
        hosts = out.select(host.alias(hname)).distinct()
        blocked_hosts = (
            hosts.select(hname, F.explode(_host_suffixes(F.col(hname))).alias("_sfx"))
            .join(F.broadcast(bl), F.col("_sfx") == F.col("_bl_domain"), "left_semi")
            .select(hname)
            .distinct()
        )
        return (
            out.withColumn(hname, host)
            .join(F.broadcast(blocked_hosts), hname, "left_anti")
            .drop(hname)
        )
    blocked = [d.lower() for d in blocked_domains]
    if not blocked:
        return out
    lit_bl = F.array(*[F.lit(d) for d in blocked])
    # coalesce: a NULL url yields a NULL suffix array, and three-valued
    # arrays_overlap would silently drop the row — blocklists keep unknowns
    return out.where(
        ~F.coalesce(F.arrays_overlap(_host_suffixes(host), lit_bl), F.lit(False))
    )

# Order matters: URLs first (emails inside URLs would otherwise double-hit),
# then emails, then the numeric shapes from most to least specific.
_PII_PATTERNS = (
    (r"\bhttps?://[^\s]+", "<URL>"),
    (r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "<EMAIL>"),
    (r"\b\d(?:[ -]?\d){12,15}\b", "<CARD>"),        # 13-16 digit runs, ends on a digit
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # no \b before "(": a paren isn't a word char, so the boundary never
    # matches there — guard with a lookbehind instead
    (r"(?<![\d.-])(?:\+?\d{1,2}[ .-]?)?(?:\(\d{3}\)|\d{3})[ .-]?\d{3}[ .-]?\d{4}\b", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_pii(text: Column | str) -> Column:
    """Redact the common PII shapes (URLs, emails, card/SSN/phone number
    runs, IPv4) with typed placeholder tags — the standard scrub step
    before pretraining text leaves the pipeline.  A chain of
    ``regexp_replace`` expressions: codegen, single pass per pattern, no
    UDF.  Pattern-based redaction is a floor, not a guarantee — a real
    deployment layers an NER model (pandas_udf, B22) on top; these regexes
    are the deterministic, engine-portable core."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, tag in _PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-tag redaction counts across the corpus — the audit view a
    data-governance pass wants next to the scrub itself."""
    red = redact_pii(text_col)
    agg = [
        F.sum(
            F.size(F.split(red, tag.replace("<", "\\<"), -1)) - 1
        ).alias(tag.strip("<>").lower() + "_hits")
        for _, tag in _PII_PATTERNS
    ]
    return df.agg(F.count("*").alias("n_docs"), *agg)


def boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 10,
    min_chars: int = 10,
) -> DataFrame:
    """Lines that repeat across many DISTINCT documents (cookie banners,
    nav bars, license footers).  Returns (line, n_docs).

    Distributed shape: explode lines -> distinct (doc, line) -> count per
    line (map-side partial agg; one shuffle on the line).  ``min_chars``
    keeps trivially short lines ("", "-") out of the boilerplate list.
    """
    lines = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("line")
    ).select(id_col, F.trim("line").alias("line"))
    return (
        lines.where(F.length("line") >= min_chars)
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 10,
    min_chars: int = 10,
) -> DataFrame:
    """Drop corpus-level boilerplate lines from every document, preserving
    the remaining lines' order.

    The boilerplate set is usually tiny (it must repeat across >= min_docs
    docs), so it broadcasts; each doc then rebuilds from its non-boilerplate
    lines: posexplode -> broadcast anti-join -> collect (pos, line) structs
    -> sort_array -> concat.  Ordering is enforced by the sort_array, not
    collect_list order (which the shuffle does not guarantee).

    EVERY input id appears in the output: a doc whose lines were all
    boilerplate (or whose text was NULL) comes back with text='' — the
    anti-join leaves it zero rows, and without the final right join to the
    id set such docs would VANISH from the pipeline instead of shrinking.
    """
    bp = boilerplate_lines(df, id_col, text_col, min_docs, min_chars)
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_raw"),
    ).withColumn("line", F.trim("_raw"))
    kept = exploded.join(F.broadcast(bp.select("line")), "line", "left_anti")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_pos", "_raw"))),
                    lambda s: s["_raw"],
                ),
                "\n",
            ).alias(text_col)
        )
    )
    all_ids = df.select(id_col).distinct()
    return all_ids.join(rebuilt, id_col, "left").select(
        id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )


def gram_hashes(
    frame: DataFrame, text_col: str, n: int, extra_cols: tuple = ()
) -> DataFrame:
    """Explode lowercased word n-grams to xxhash64 longs (column ``_g``,
    plus any ``extra_cols`` carried through) — THE canonical n-gram key
    for decontamination.  The exact route here and the Bloom-guarded
    route (operators/bloom.py) must hash identically or the bloom path's
    exactness guarantee silently breaks; both import this one helper."""
    from .dedup import shingles

    lowered = F.lower(F.col(text_col))
    return frame.select(
        *[F.col(c) for c in extra_cols],
        F.explode(
            F.transform(shingles(lowered, n), lambda s: F.xxhash64(s))
        ).alias("_g"),
    )


def contaminated_ids(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM recipe): a training doc is
    contaminated if it shares ANY word n-gram (n=13 canonical) with the
    evaluation set.  Returns the distinct contaminated ids.

    Scale shape: both sides explode to n-gram HASHES (xxhash64 of the
    shingle — longs, not strings), the benchmark side is distinct-ed and
    broadcast (eval sets are tiny next to a 100 TB corpus), and a
    left-semi equi-join keeps matching corpus rows.  One scan per side,
    no shuffle of the corpus (broadcast join), distinct only over ids.
    """
    bench = gram_hashes(benchmark, bench_text_col, n).distinct()
    corpus = gram_hashes(df, text_col, n, extra_cols=(id_col,))
    return (
        corpus.join(F.broadcast(bench), "_g", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Drop contaminated documents (see ``contaminated_ids``)."""
    bad = contaminated_ids(df, benchmark, id_col, text_col, bench_text_col, n)
    return df.join(bad, id_col, "left_anti")


def canonicalize_text_udf(form: str = "NFC", casefold: bool = True, strip_accents: bool = False):
    """Arrow-vectorized Unicode canonicalizer for dedup keys.

    Spark has no NFC/NFKC builtin, and composed vs decomposed encodings of
    the same visible string ("café" as U+00E9 vs e+U+0301) defeat
    hash-based exact dedup.  This pandas_udf normalizes to ``form``,
    optionally casefolds (full Unicode case folding, stronger than
    lower()), and optionally strips combining marks after NFD — all via
    pandas' vectorized str methods, no per-row Python.  Use it to build
    the dedup KEY column; keep the original text as the payload.
    """
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NOTE: annotations must be resolvable by pyspark's get_type_hints —
    # under `from __future__ import annotations` they are strings, so the
    # evaluation namespace needs `pd`; provide it via the function globals.
    globals().setdefault("pd", pd)

    @pandas_udf("string")
    def canonicalize(s: pd.Series) -> pd.Series:
        out = s.str.normalize(form)
        if casefold:
            out = out.str.casefold()
        if strip_accents:
            out = (
                out.str.normalize("NFD")
                .map(
                    lambda t: None
                    if t is None
                    else "".join(c for c in t if not unicodedata.combining(c)),
                    na_action="ignore",
                )
                .str.normalize(form)
            )
        return out

    return canonicalize


def _repetition_signal_schema(top_ns: tuple, dup_ns: tuple) -> str:
    fields = [
        "n_lines int", "dup_line_frac double", "dup_line_char_frac double",
        "n_paras int", "dup_para_frac double", "dup_para_char_frac double",
    ]
    fields += [f"top_{n}gram_char_frac double" for n in top_ns]
    fields += [f"dup_{n}gram_char_frac double" for n in dup_ns]
    return ", ".join(fields)


def repetition_signals_udf(top_ns: tuple = (2, 3, 4), dup_ns: tuple = (5, 10)):
    """Arrow-vectorized pandas_udf computing the Gopher/RefinedWeb
    repetition signal family per document (Rae et al. 2021 §A1.1, Penedo
    et al. 2023 — both public papers).  Degenerate machine text repeats
    itself; these fractions are THE published keep/drop features for it.

    Definitions (documented here because the golden tests re-derive them
    independently in pure Python):

    - lines / paragraphs: split on '\\n' / blank-line runs, trimmed,
      empties dropped.
    - dup_line_frac: occurrences of lines whose text occurs >1 time in the
      doc, over all line occurrences (Gopher counts every occurrence, not
      occurrences-beyond-first).  dup_line_char_frac weights by character
      length.  Same pair for paragraphs.
    - top_{n}gram_char_frac (n=2,3,4): occurrences of the single most
      frequent word n-gram x its character length, over the character
      length of the whitespace-collapsed text.  Ties break by (count,
      gram char length, lexicographic) so the value is deterministic.
    - dup_{n}gram_char_frac (n=5,10): POSITION-MARKING coverage — mark
      every token position covered by any n-gram occurring >1 time, then
      chars of marked tokens over chars of all tokens.  Overlapping
      duplicated n-grams count each character once (the RefinedWeb
      definition; the naive sum overcounts overlap).

    Scale shape: a narrow per-row map over Arrow batches — NO shuffle, no
    explode; each doc costs O(tokens).  At 100 TB this is the cheapest
    possible plan (embarrassingly parallel scan), which is why the
    counting work lives here and not in an explode->groupBy pipeline that
    would shuffle every n-gram of the corpus.

    ``top_ns`` / ``dup_ns`` choose which n-gram statistics are computed —
    each extra n is a full Counter pass over the doc's tokens, so callers
    that consume a subset (quality_gate reads only n=2 and n=5) request
    only that subset instead of paying for all five.

    Tokens split on the explicit ASCII ``_WS_CHARS`` class (not
    str.split's Unicode set) so these fractions and the Catalyst-side
    shape ratios in ``repetition_signals`` count the same tokens.
    """
    from collections import Counter

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    globals().setdefault("pd", pd)

    def _dup_fracs(parts: list[str]) -> tuple[int, float, float]:
        n = len(parts)
        if n == 0:
            return 0, 0.0, 0.0
        counts = Counter(parts)
        dup_occ = sum(c for c in counts.values() if c > 1)
        total_chars = sum(len(p) for p in parts)
        dup_chars = sum(len(p) * c for p, c in counts.items() if c > 1)
        return (
            n,
            dup_occ / n,
            (dup_chars / total_chars) if total_chars else 0.0,
        )

    def _top_gram_frac(toks: list[str], n: int, text_chars: int) -> float:
        if len(toks) < n or text_chars == 0:
            return 0.0
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        best = max(grams.items(), key=lambda kv: (kv[1], len(kv[0]), kv[0]))
        return best[1] * len(best[0]) / text_chars

    def _dup_gram_coverage(toks: list[str], n: int) -> float:
        total_chars = sum(len(t) for t in toks)
        if len(toks) < n or total_chars == 0:
            return 0.0
        grams = Counter(tuple(toks[i : i + n]) for i in range(len(toks) - n + 1))
        covered = [False] * len(toks)
        for i in range(len(toks) - n + 1):
            if grams[tuple(toks[i : i + n])] > 1:
                for j in range(i, i + n):
                    covered[j] = True
        dup_chars = sum(len(t) for t, c in zip(toks, covered) if c)
        return dup_chars / total_chars

    def _signals(text) -> dict:
        if text is None:
            text = ""
        lines = [ln.strip(_WS_CHARS) for ln in text.split("\n")]
        lines = [ln for ln in lines if ln]
        paras = [p.strip(_WS_CHARS) for p in _BLANK_LINE_RUN.split(text)]
        paras = [p for p in paras if p]
        toks = [t for t in _TOKEN_SPLIT_RE.split(text) if t]
        text_chars = len(" ".join(toks))
        n_lines, dlf, dlcf = _dup_fracs(lines)
        n_paras, dpf, dpcf = _dup_fracs(paras)
        out = {
            "n_lines": n_lines,
            "dup_line_frac": dlf,
            "dup_line_char_frac": dlcf,
            "n_paras": n_paras,
            "dup_para_frac": dpf,
            "dup_para_char_frac": dpcf,
        }
        for n in top_ns:
            out[f"top_{n}gram_char_frac"] = _top_gram_frac(toks, n, text_chars)
        for n in dup_ns:
            out[f"dup_{n}gram_char_frac"] = _dup_gram_coverage(toks, n)
        return out

    @pandas_udf(_repetition_signal_schema(top_ns, dup_ns))
    def signals(s: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([_signals(t) for t in s])

    return signals


def _shape_metric_columns(text: Column) -> dict[str, Column]:
    """The cheap Gopher "shape" signals as pure Catalyst expressions,
    shared by ``repetition_signals`` (reporting) and ``quality_gate``
    (filtering) so the two can never drift: symbol_word_ratio ('#' chars
    + ellipses per word), bullet_line_frac (lines starting '-', '*', or a
    bullet), ellipsis_line_frac (lines ending '...' or the Unicode
    ellipsis), alpha_word_frac (words containing an ASCII letter).
    Tokens/lines split and trim on the same ``_WS_CLASS`` the signal udf
    uses."""
    toks = F.filter(F.split(text, TOKEN_SPLIT_REGEX), lambda t: t != "")
    n_words = F.size(toks)
    lines = F.filter(
        F.transform(F.split(text, "\n"), _ws_trim), lambda ln: ln != ""
    )
    n_lines = F.size(lines)
    hashes = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ellipses = F.size(F.split(text, r"\.\.\.|…", -1)) - 1
    bullet = F.size(F.filter(lines, lambda ln: ln.rlike(r"^(-|\*|•)")))
    ell_end = F.size(F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)$")))
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))

    def frac(num, den):
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    return {
        "symbol_word_ratio": frac(hashes + ellipses, n_words),
        "bullet_line_frac": frac(bullet, n_lines),
        "ellipsis_line_frac": frac(ell_end, n_lines),
        "alpha_word_frac": frac(alpha, n_words),
    }


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher/RefinedWeb repetition + shape signals — the
    quality-filter feature block a pretraining pipeline thresholds on.

    Two layers in ONE projection over the scan (zero shuffles):
    - the counting-heavy repetition fractions via ``repetition_signals_udf``
      (Arrow-batched; see its docstring for definitions), and
    - the cheap Gopher "shape" signals via ``_shape_metric_columns``
      (pure Catalyst expressions).

    Gopher's published cutoffs for reference (not applied here — this
    operator measures, ``quality_gate`` thresholds): see
    :data:`GOPHER_THRESHOLDS`.
    """
    text = F.col(text_col)
    shapes = _shape_metric_columns(text)
    sig = repetition_signals_udf()
    return df.select(
        F.col(id_col),
        sig(text).alias("_rep"),
        *[F.round(c, 6).alias(name) for name, c in shapes.items()],
    ).select(F.col(id_col), "_rep.*", *shapes.keys())


# Gopher's published keep/drop cutoffs (Rae et al. 2021 Table A1) — the
# defaults quality_gate applies; override any subset per corpus.
GOPHER_THRESHOLDS = {
    "dup_line_frac_max": 0.30,
    "dup_para_frac_max": 0.30,
    "top_2gram_char_frac_max": 0.20,
    "dup_5gram_char_frac_max": 0.15,
    "symbol_word_ratio_max": 0.10,
    "bullet_line_frac_max": 0.90,
    "ellipsis_line_frac_max": 0.30,
    "alpha_word_frac_min": 0.80,
}


def quality_gate(
    df: DataFrame,
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Keep/drop gate over the Gopher repetition + shape signals: every
    input column passes through, plus ``keep`` (bool) and ``drop_reasons``
    (array of violated rule names, empty when keeping).

    A stateless projection — NO shuffle, no state — so the SAME call runs
    unchanged on a batch DataFrame or a ``readStream`` source: this is the
    filter a crawl-ingest pipeline applies as documents land, before
    anything is persisted.  Batch/streaming equivalence is asserted in
    tests/test_streaming_multimodal.py.

    ``thresholds`` overrides any subset of :data:`GOPHER_THRESHOLDS`
    (``*_max`` rules fail above the value, ``*_min`` rules below).
    Unknown keys raise ValueError rather than silently not filtering.

    NOTE: Gopher applies these cutoffs AFTER its 50..100k-word length
    filter; on very short documents the top-n-gram character fraction is
    dominated by a single occurrence and over-fires.  Compose with a
    token-count filter first (``token_count``), as the paper does.
    """
    th = dict(GOPHER_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(th)
        if unknown:
            raise ValueError(f"unknown quality_gate thresholds: {sorted(unknown)}")
        th.update(thresholds)

    text = F.col(text_col)
    # the udf struct lands ONCE as a column, then every rule reads a field
    # from it — referencing the udf expression per rule could re-evaluate
    # the (Python) signal computation up to 4x.  Only the n-gram stats the
    # rules actually read (n=2 top, n=5 coverage) are computed: this gate
    # sits on the ingest hot path and the unused n=3/4/10 Counter passes
    # are ~40% extra Python work per document.
    sig = repetition_signals_udf(top_ns=(2,), dup_ns=(5,))
    sname = _free_colname(df, "_sig")  # collision-safe on the user's frame
    with_sig = df.select("*", sig(text).alias(sname))
    metrics = {
        "dup_line_frac": F.col(f"{sname}.dup_line_frac"),
        "dup_para_frac": F.col(f"{sname}.dup_para_frac"),
        "top_2gram_char_frac": F.col(f"{sname}.top_2gram_char_frac"),
        "dup_5gram_char_frac": F.col(f"{sname}.dup_5gram_char_frac"),
        **_shape_metric_columns(text),
    }
    reasons = []
    for rule, limit in sorted(th.items()):
        metric, kind = rule.rsplit("_", 1)
        violated = (
            metrics[metric] > F.lit(limit)
            if kind == "max"
            else metrics[metric] < F.lit(limit)
        )
        reasons.append(F.when(violated, F.lit(rule)))
    drop_reasons = F.array_compact(F.array(*reasons))
    return with_sig.select(
        "*",
        (F.size(drop_reasons) == 0).alias("keep"),
        drop_reasons.alias("drop_reasons"),
    ).drop(sname)


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-level EXACT paragraph dedup (the C4/RefinedWeb step below
    document-level dedup): every paragraph that occurs anywhere else in
    the corpus keeps only its FIRST occurrence — smallest (id, position)
    wins — and every later occurrence is dropped from its document; the
    surviving paragraphs rejoin in original order.

    Distributed shape: posexplode paragraphs -> groupBy (xxhash64, text)
    keeps min(struct(id, pos)) [one shuffle, partial agg map-side] ->
    equi-join keeper back on the same pair [same key, AQE co-partitions]
    -> rebuild per doc via sort_array over (pos, para) structs [one
    shuffle on id].  The paragraph TEXT stays in the group/join key — the
    hash alone would silently merge two distinct paragraphs on a 64-bit
    collision (statistically expected beyond ~5e9 paragraphs) and delete
    one of them corpus-wide; the hash rides along so the shuffle
    partitioner works from 8 bytes.  Nothing is ever compared all-pairs
    and no driver state exists, so the plan survives a 100 TB corpus; the
    keeper table is NOT broadcast because duplicate paragraphs can be a
    large fraction of a crawl.

    Docs whose paragraphs were ALL dropped (or whose text was NULL) come
    back with text='' rather than vanishing — same contract as
    ``remove_boilerplate_lines``.  Returns (id_col, text_col,
    n_paras_kept, n_paras_dropped).
    """
    paras = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), PARA_SPLIT_REGEX)).alias("_pos", "_raw"),
        )
        .withColumn("_para", _ws_trim(F.col("_raw")))
        .where(F.length("_para") >= min_chars)
        .withColumn("_h", F.xxhash64("_para"))
    )
    keepers = paras.groupBy("_h", "_para").agg(
        F.min(F.struct(F.col(id_col).alias("_kid"), F.col("_pos").alias("_kpos"))).alias("_k")
    )
    tagged = paras.join(keepers, ["_h", "_para"]).withColumn(
        "_keep", (F.col("_k._kid") == F.col(id_col)) & (F.col("_k._kpos") == F.col("_pos"))
    )
    rebuilt = tagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct("_pos", "_para"))
                    )
                ),
                lambda s: s["_para"],
            ),
            "\n\n",
        ).alias(text_col),
        F.sum(F.col("_keep").cast("int")).alias("n_paras_kept"),
        F.sum((~F.col("_keep")).cast("int")).alias("n_paras_dropped"),
    )
    all_ids = df.select(id_col).distinct()
    return all_ids.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        F.coalesce("n_paras_kept", F.lit(0)).alias("n_paras_kept"),
        F.coalesce("n_paras_dropped", F.lit(0)).alias("n_paras_dropped"),
    )


def canonical_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    form: str = "NFC",
    casefold: bool = True,
    strip_accents: bool = False,
) -> DataFrame:
    """Exact dedup on the CANONICAL form of the text: rows whose texts are
    Unicode-equivalent (same NFC form, case-insensitive by default) keep
    only the smallest id; the surviving row keeps its ORIGINAL text.  One
    extra projection over plain exact_dedup — the normalization runs
    map-side inside the same scan."""
    from .dedup import exact_dedup

    canon = canonicalize_text_udf(form, casefold, strip_accents)
    with_key = df.withColumn("_canon", canon(F.col(text_col)))
    return exact_dedup(with_key, ["_canon"], id_col).drop("_canon")
