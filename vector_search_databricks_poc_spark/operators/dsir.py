"""DSIR-style importance resampling: select raw-corpus documents that look
like a target domain (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling").

The published recipe, re-expressed as lazy DataFrame algebra:

1. **Features** — every document reduces to a bag of hashed n-grams
   (unigrams + bigrams of lowercased whitespace tokens, hashed into ``B``
   buckets).  Pure expressions, engine-portable (the polynomial string
   hash the DuckDB oracle reproduces bit-exactly).
2. **Fit** — bucket-categorical distributions of the raw corpus and the
   target corpus; the importance weight of bucket ``b`` is the smoothed
   log-likelihood ratio ``ln p_target(b) - ln p_raw(b)``.  Two groupBys
   (map-side partial agg shrinks each to <= B rows before the shuffle)
   densified over ``spark.range(B)`` so the weight table has exactly B
   rows — small enough to broadcast at any corpus size.
3. **Score** — a document's log importance weight is the sum of its
   features' bucket weights: explode -> broadcast-join the B-row weight
   table -> per-doc sum.  One shuffle, keyed by doc id.
4. **Resample** — Gumbel top-k: keep the ``n`` docs with the largest
   ``score/temperature + Gumbel(0,1)``, the exact published sampler (a
   Gumbel-perturbed top-k IS sampling-without-replacement proportional to
   softmax(score/T)).  The Gumbel noise derives from the deterministic
   mixed id hash, so the kept set is reproducible on any engine and any
   cluster size — and verifiable by the DuckDB oracle.

100 TB shape: the fit touches the raw corpus once and the (much smaller)
target once; scoring is one explode + broadcast join + per-doc partial
agg; selection is a TakeOrderedAndProject (no global sort).  For repeated
scoring runs against a frozen fit, :func:`dsir_scores_literal` closes the
collected B-float table over an Arrow-batched pandas_udf — zero joins,
zero shuffles on the scoring pass (a B-sized literal array in the plan
would stress Catalyst analysis instead; see the 50k-literal lesson in
``operators/text.url_filter``).

Reference parity: the reference engine has no data-selection operator at
all (its corpus is a fixed arXiv pull, syntetic_data_arxiv.py); this is
part of the LLM-pipeline family the build brief mandates beyond it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_string_hash
from .sampling import _MIX, _P31, portable_id_key
from .text import TOKEN_SPLIT_REGEX

__all__ = [
    "ngram_buckets",
    "dsir_bucket_weights",
    "dsir_scores",
    "dsir_scores_literal",
    "collect_bucket_weights",
    "gumbel_key",
    "dsir_select",
]


def _grams(text: Column | str, ns: tuple[int, ...]) -> Column:
    """Lowercased whitespace-token n-grams for every n in ``ns``, as one
    flat array<string>; words join with a single space."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.filter(
        F.split(F.lower(c), TOKEN_SPLIT_REGEX), lambda t: t != ""
    )
    parts = []
    for n in ns:
        if n == 1:
            parts.append(toks)
            continue
        # slide an n-window: positions 1 .. size-n+1.  sequence(1, hi<1)
        # yields a DESCENDING array, so clamp hi to >=1 and slice to the
        # true (possibly zero) length instead.
        cnt = F.size(toks) - (n - 1)
        idx = F.slice(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            1,
            F.greatest(cnt, F.lit(0)),
        )
        parts.append(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def ngram_buckets(
    text: Column | str, buckets: int = 10_000, ns: tuple[int, ...] = (1, 2)
) -> Column:
    """Hashed n-gram feature multiset of a document: array<long> of bucket
    ids in [0, buckets).  Duplicates are kept — DSIR weights count feature
    OCCURRENCES, not presence."""
    grams = _grams(text, ns)
    return F.transform(grams, lambda g: F.pmod(portable_string_hash(g), F.lit(buckets)))


def _bucket_counts(df: DataFrame, text_col: str, buckets: int, ns) -> DataFrame:
    return (
        df.select(F.explode(ngram_buckets(text_col, buckets, ns)).alias("_b"))
        .groupBy("_b")
        .agg(F.count("*").alias("_c"))
    )


def dsir_bucket_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    smoothing: float = 1.0,
) -> DataFrame:
    """The fitted importance-weight table: exactly ``buckets`` rows
    ``(_b, _w)`` with ``_w = ln((t_b+s)/(T+sB)) - ln((r_b+s)/(R+sB))``
    (add-s smoothed log-likelihood ratio).  Dense over ``range(B)`` so
    every bucket a scored document can reference has a row — including
    buckets unseen in either corpus (they earn the smoothed "no evidence"
    weight instead of silently dropping the feature).  Fully lazy; the
    corpus totals re-enter the plan as broadcast one-row aggregates."""
    if smoothing <= 0.0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    spark = raw_df.sparkSession
    rc = _bucket_counts(raw_df, text_col, buckets, ns)
    tc = _bucket_counts(target_df, text_col, buckets, ns)
    dense = spark.range(buckets).select(F.col("id").alias("_b"))
    joined = (
        dense.join(rc.withColumnRenamed("_c", "_rc"), "_b", "left")
        .join(tc.withColumnRenamed("_c", "_tc"), "_b", "left")
        .select(
            "_b",
            F.coalesce("_rc", F.lit(0)).alias("_rc"),
            F.coalesce("_tc", F.lit(0)).alias("_tc"),
        )
    )
    tot = joined.agg(
        F.sum("_rc").alias("_R"), F.sum("_tc").alias("_T")
    )
    s = float(smoothing)
    sb = s * buckets
    return joined.join(F.broadcast(tot)).select(
        "_b",
        (
            F.log((F.col("_tc") + s) / (F.col("_T") + sb))
            - F.log((F.col("_rc") + s) / (F.col("_R") + sb))
        ).alias("_w"),
    )


def dsir_scores(
    df: DataFrame,
    weights_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Per-document log importance weight: ``(id_col, dsir_score)``.

    ``buckets``/``ns`` MUST match the fit.  Documents with no tokens have
    no features and score 0.0 (kept: a selection that silently drops rows
    is a dedup bug waiting to happen — ``explode_outer`` keeps them as a
    NULL feature row in the SAME single pass).  Shape: explode features ->
    broadcast-join the B-row weight table -> one per-doc hash aggregate."""
    feats = df.select(
        F.col(id_col),
        F.explode_outer(ngram_buckets(text_col, buckets, ns)).alias("_b"),
    )
    return (
        feats.join(F.broadcast(weights_df), "_b", "left")
        .groupBy(id_col)
        .agg(F.round(F.coalesce(F.sum("_w"), F.lit(0.0)), 6).alias("dsir_score"))
    )


def collect_bucket_weights(weights_df: DataFrame, buckets: int) -> list[float]:
    """Materialize the fitted weight table as a dense B-float list (the
    frozen-fit artifact for :func:`dsir_scores_literal`).  B floats — a
    bounded metadata collect, like centroids after a KMeans fit."""
    out = [0.0] * buckets
    for r in weights_df.collect():
        out[int(r["_b"])] = float(r["_w"])
    return out


def dsir_scores_literal(
    df: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Shuffle-free twin of :func:`dsir_scores` for a frozen fit: the
    dense weight list rides an Arrow-batched pandas_udf closure (numpy
    fancy-index + sum per batch), so scoring is a pure map — no explode,
    no join, no aggregate.  Tokenization/hashing replicate the expression
    path exactly (parity-asserted in tests)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # `from __future__ import annotations` stringifies the udf type hints;
    # pandas_udf resolves them against module globals (same fix as bpe.py)
    globals().setdefault("pd", pd)

    w = np.asarray(weights, dtype=np.float64)
    b = len(weights)
    ns_t = tuple(ns)

    @pandas_udf("double")
    def score(s: pd.Series) -> pd.Series:
        import re

        splitter = re.compile(TOKEN_SPLIT_REGEX)

        def poly(g: str) -> int:
            acc = 0
            for ch in g:
                acc = (acc * 131 + ord(ch)) % _P31
            return acc

        def one(text):
            if text is None:
                return 0.0
            toks = [t for t in splitter.split(text.lower()) if t]
            total = 0.0
            for n in ns_t:
                for i in range(len(toks) - n + 1):
                    g = " ".join(toks[i : i + n])
                    total += w[poly(g) % b]
            return round(total, 6)

        return s.map(one)

    return df.select(F.col(id_col), score(F.col(text_col)).alias("dsir_score"))


def gumbel_key(id_col: str | Column) -> Column:
    """Deterministic engine-portable Gumbel(0,1) draw per id:
    ``u = (mixed_hash + 0.5) / P31`` lies strictly inside (0, 1), then the
    inverse-CDF ``-ln(-ln u)``.  Same value on every run, every cluster
    size, and in the DuckDB oracle."""
    h = F.pmod(portable_id_key(id_col) * F.lit(_MIX), F.lit(_P31))
    u = (h + F.lit(0.5)) / F.lit(float(_P31))
    return -F.log(-F.log(u))


def dsir_select(
    df: DataFrame,
    target_df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    smoothing: float = 1.0,
    temperature: float = 1.0,
) -> DataFrame:
    """End-to-end DSIR selection, ONE lazy plan: fit weights with ``df``
    as the raw distribution, score every doc, keep the Gumbel-top-``n``
    of ``dsir_score/temperature + gumbel``.  ``temperature`` flattens
    (>1) or sharpens (<1) the implied softmax; the limit T->0 is
    deterministic top-n by score.  Selection is a
    TakeOrderedAndProject — no global sort materializes."""
    if n <= 0:
        raise ValueError(f"n must be > 0, got {n}")
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    from ..catalog import ensure_parallelism

    # the n-gram explode is CPU-heavy expression work whose input-split
    # parallelism is sized by BYTES — a small single-file corpus arrives
    # as one task and serializes the whole fit+score on one core (same
    # guard as the minhash signature stage; no-op at real input sizes)
    df = ensure_parallelism(df)
    target_df = ensure_parallelism(target_df)
    wdf = dsir_bucket_weights(df, target_df, text_col, buckets, ns, smoothing)
    scored = dsir_scores(df, wdf, id_col, text_col, buckets, ns)
    keyed = scored.withColumn(
        "gumbel_key",
        F.round(F.col("dsir_score") / F.lit(float(temperature)) + gumbel_key(id_col), 6),
    )
    return keyed.orderBy(F.desc("gumbel_key"), F.col(id_col)).limit(n)
