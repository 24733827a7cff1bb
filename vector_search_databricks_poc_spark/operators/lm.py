"""N-gram language-model perplexity filter (the CCNet third leg).

CCNet (Wenzek et al. 2020, public) filters crawl text with three tools:
language id, dedup, and a KenLM n-gram model's perplexity against a
clean reference corpus — low perplexity ≈ fluent, reference-like text.
The engine already has the first two; this module adds the LM leg as a
bigram stupid-backoff model (Brants et al. 2007 — the smoothing designed
FOR distributed large-scale LMs: no discounting state, just counts):

    S(w | prev) = count(prev w) / count(prev)        if bigram seen
                = 0.4 * count(w) / total             otherwise
    doc score   = mean negative log S over positions (log-perplexity)

Distributed shape:

- **Training = two capped count aggregations.**  Unigrams: one groupBy,
  top ``max_vocab`` kept (TakeOrdered, ties by token), everything else
  folds into ``<unk>``.  Bigrams: one groupBy over the unk-mapped token
  stream, top ``max_bigrams`` kept.  Only the CAPPED tables reach the
  driver — the model is bounded state (like KenLM's pruned model), the
  corpus never is.
- **Scoring = one shuffle-free map.**  The count dicts broadcast in the
  pandas_udf closure; per-doc log-perplexity is a pure function of the
  doc's tokens, so scores are exactly reproducible (asserted against an
  independent pure-Python reference in tests, to the rounding digit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import TOKEN_SPLIT_REGEX

UNK = "<unk>"
_BACKOFF = 0.4  # Brants et al.'s fixed backoff weight


def _tok(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_REGEX), lambda t: t != ""
    )


class NgramLM:
    """Bounded stupid-backoff bigram model: plain dict state, picklable
    into a scoring udf closure."""

    def __init__(self, unigrams: dict, bigrams: dict, total: int):
        self.unigrams = unigrams  # token -> count (includes UNK)
        self.bigrams = bigrams  # (prev, w) -> count
        self.total = total

    def doc_logppl(self, tokens) -> float | None:
        """Mean negative natural-log score per position; None for empty."""
        import math

        if not tokens:
            return None
        uni, bi, total = self.unigrams, self.bigrams, self.total
        toks = [t if t in uni else UNK for t in (t.lower() for t in tokens)]
        s = 0.0
        prev = None
        for w in toks:
            cu = uni.get(w, uni.get(UNK, 1))
            if prev is not None:
                cb = bi.get((prev, w))
                p = (cb / uni.get(prev, 1)) if cb else _BACKOFF * cu / total
            else:
                p = cu / total
            s += -math.log(p)
            prev = w
        return s / len(toks)


def train_ngram_lm(
    df: DataFrame,
    text_col: str = "text",
    max_vocab: int = 50_000,
    max_bigrams: int = 500_000,
) -> NgramLM:
    """Fit the bounded model (see module head).  Deterministic: both caps
    order by (count desc, key asc)."""
    toks = df.select(_tok(text_col).alias("_t"))
    uni_rows = (
        toks.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.col("w"))
        .limit(max_vocab)
        .collect()
    )
    unigrams = {r["w"]: r["c"] for r in uni_rows}
    # total INCLUDES out-of-vocab mass: every OOV occurrence counts as UNK
    total_row = toks.agg(F.sum(F.size("_t")).alias("n")).first()
    total = int(total_row["n"] or 0)
    oov = total - sum(unigrams.values())
    if oov > 0:
        unigrams[UNK] = unigrams.get(UNK, 0) + oov
    # unk-mapping via an Arrow-batched set lookup — a 50k-literal
    # array_contains expression would explode Catalyst analysis time (the
    # same lesson as the ADC LUTs in operators/index.py)
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    globals().setdefault("pd", pd)
    vocab_set = frozenset(unigrams)

    @pandas_udf("array<string>")
    def _unk_map(s: pd.Series) -> pd.Series:
        return s.map(
            lambda arr: None
            if arr is None
            else [t if t in vocab_set else UNK for t in arr]
        )

    mapped = toks.select(_unk_map("_t").alias("_m"))
    bi_rows = (
        mapped.select(
            F.explode(
                F.when(
                    F.size("_m") >= 2,
                    F.zip_with(
                        F.slice("_m", 1, F.size("_m") - 1),
                        F.slice("_m", 2, F.size("_m") - 1),
                        lambda a, b: F.struct(a.alias("p"), b.alias("w")),
                    ),
                ).otherwise(F.array())
            ).alias("bg")
        )
        .groupBy("bg.p", "bg.w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.col("p"), F.col("w"))
        .limit(max_bigrams)
        .collect()
    )
    bigrams = {(r["p"], r["w"]): r["c"] for r in bi_rows}
    return NgramLM(unigrams, bigrams, max(total, 1))


def logppl_udf(model: NgramLM):
    """Arrow-batched per-doc log-perplexity column (double; NULL for
    empty/NULL docs).  Model dicts ride the closure broadcast."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    import re

    globals().setdefault("pd", pd)
    splitter = re.compile(TOKEN_SPLIT_REGEX)

    @pandas_udf("double")
    def logppl(s: pd.Series) -> pd.Series:
        def one(text):
            if text is None:
                return None
            return model.doc_logppl([t for t in splitter.split(text) if t])

        return s.map(one)

    return logppl


def perplexity_filter(
    df: DataFrame, model: NgramLM, max_logppl: float, text_col: str = "text"
) -> DataFrame:
    """Keep rows whose log-perplexity under the reference model is at
    most ``max_logppl`` (CCNet keeps the low-perplexity head/middle).
    One shuffle-free map; empty/NULL docs drop (no evidence of fluency)."""
    lp = logppl_udf(model)
    return df.where(lp(F.col(text_col)) <= max_logppl)
