"""Byte-pair-encoding tokenizer (training-data pipeline support).

Token COUNTS drive every packing/budget decision in a training pipeline
(sequence packing, mixture budgets, per-doc length filters), and the
whitespace token count drifts badly from what a real subword tokenizer
produces.  This module trains a deterministic BPE vocabulary (Sennrich et
al. 2016, the GPT-2 recipe's core) and applies it distributed:

- **Training is one aggregation + a bounded driver fit** — the corpus
  contributes ONLY a word-frequency table (one shuffle, map-side partial
  agg), capped to the ``max_words`` most frequent forms
  (TakeOrderedAndProject, no full sort); the merge loop then runs
  driver-side over that capped table, exactly like a KMeans fit touches
  only sampled/aggregated state.  Nothing per-document ever reaches the
  driver.
- **Encoding is Arrow-batched** (pandas_udf) with a per-batch word memo:
  natural text repeats words heavily, so each distinct word is merged
  once per batch and the loop cost is O(distinct words), not O(tokens).
- **Deterministic end to end**: ties in the merge loop break by
  (count desc, pair lexicographic asc), so the same corpus always yields
  the same merge table on any cluster size or partitioning — asserted
  against an independent pure-Python reference in tests.

The reference engine has no tokenizer at all (its only text processing
is the arXiv field cleanup, syntetic_data_arxiv.py:87-105); token
budgets there are delegated to the embedding service.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.text import TOKEN_SPLIT_REGEX

_EOW = "▁"  # end-of-word sentinel (SentencePiece's marker codepoint;
# cannot collide with real text after the whitespace split below removes
# none of the word's interior chars — documented, not stripped from input:
# a word CONTAINING it simply trains/encodes as its own symbol sequence)


def word_counts(
    df: DataFrame, text_col: str = "text", max_words: int = 100_000
) -> list[tuple[str, int]]:
    """The ``max_words`` most frequent whitespace-split words with counts —
    the ONLY corpus-derived state BPE training consumes.  One shuffle
    (map-side partial agg); the cap is a TakeOrderedAndProject, ties by
    word so the training set is deterministic."""
    wc = (
        df.select(
            F.explode(
                F.filter(F.split(F.col(text_col), TOKEN_SPLIT_REGEX), lambda t: t != "")
            ).alias("_w")
        )
        .groupBy("_w")
        .agg(F.count("*").alias("_c"))
        .orderBy(F.desc("_c"), F.col("_w"))
        .limit(max_words)
    )
    return [(r["_w"], r["_c"]) for r in wc.collect()]


def train_bpe_merges(
    counts: list[tuple[str, int]], num_merges: int = 1000
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table (pure
    Python, deterministic).  Each word is a char sequence ending in the
    end-of-word sentinel; every step merges the (count desc, pair asc)
    most frequent adjacent symbol pair.  Returns the ordered merge list —
    the whole tokenizer model (the vocab is implied)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in counts:
        sym = tuple(w) + (_EOW,)
        vocab[sym] = vocab.get(sym, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nv: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            nv[t] = nv.get(t, 0) + c
        vocab = nv
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the lowest-rank
    adjacent pair (the canonical GPT-2 apply loop)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Distributed-count + driver-fit BPE training (see module head)."""
    return train_bpe_merges(word_counts(df, text_col, max_words), num_merges)


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """Arrow-batched encoder: text column -> array<string> of BPE tokens.
    The merge table rides the closure (a few 100 KB at 50k merges —
    task-broadcast by Spark); each batch memoizes per distinct word."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}
    globals().setdefault("pd", pd)

    @pandas_udf("array<string>")
    def encode(s: pd.Series) -> pd.Series:
        import re

        splitter = re.compile(TOKEN_SPLIT_REGEX)
        memo: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return None
            out: list[str] = []
            for w in splitter.split(text):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    memo[w] = got
                out.extend(got)
            return out

        return s.map(enc)

    return encode


def bpe_token_count(df: DataFrame, merges, text_col: str = "text") -> Column:
    """BPE token count column for packing/budget math — the subword count
    a real tokenizer would bill, not the whitespace approximation."""
    enc = bpe_encode_udf(merges)
    return F.size(enc(F.col(text_col)))


# ---------------------------------------------------------------------------
# vocabulary & id encoding (the packed-sequence producer consumes ids)
# ---------------------------------------------------------------------------

EOS_ID = 0
UNK_ID = 1


def bpe_vocab(
    counts: list[tuple[str, int]], merges: list[tuple[str, str]]
) -> dict[str, int]:
    """Deterministic symbol->id table implied by a training run:
    id 0 = end-of-sequence, id 1 = unknown, then the sorted base alphabet
    (every char of the counted words, each also in its word-final
    ``char+EOW`` form, plus the bare EOW for empty-ish words), then merge
    products in merge order.  Encoding any text drawn from the training
    distribution hits only these symbols; novel chars map to UNK_ID."""
    alphabet: set[str] = {_EOW}
    for w, _ in counts:
        for ch in w:
            alphabet.add(ch)
            alphabet.add(ch + _EOW)
    vocab: dict[str, int] = {}
    nxt = 2  # 0=eos, 1=unk
    for sym in sorted(alphabet):
        vocab[sym] = nxt
        nxt += 1
    for a, b in merges:
        m = a + b
        if m not in vocab:
            vocab[m] = nxt
            nxt += 1
    return vocab


def bpe_encode_ids_udf(merges: list[tuple[str, str]], vocab: dict[str, int]):
    """Arrow-batched encoder straight to ids: text -> array<int>.  Same
    merge loop + per-batch word memo as ``bpe_encode_udf``; symbols
    outside ``vocab`` become UNK_ID (they can only arise from chars the
    training corpus never saw)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}
    globals().setdefault("pd", pd)

    @pandas_udf("array<int>")
    def encode(s: pd.Series) -> pd.Series:
        import re

        splitter = re.compile(TOKEN_SPLIT_REGEX)
        memo: dict[str, list[int]] = {}

        def enc(text):
            if text is None:
                return None
            out: list[int] = []
            for w in splitter.split(text):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = [vocab.get(t, UNK_ID) for t in encode_word(w, ranks)]
                    memo[w] = got
                out.extend(got)
            return out

        return s.map(enc)

    return encode


def bpe_decode_ids_udf(vocab: dict[str, int]):
    """Arrow-batched decoder: array<int> of ids -> text, the inverse of
    ``bpe_encode_ids_udf`` up to whitespace normalization (the split is
    whitespace-only, so decode reconstructs the single-space-joined word
    stream EXACTLY whenever no UNK_ID is present — asserted as a
    round-trip property in tests).  What it's for: auditing packed
    training sequences (what text actually landed in example 17?) and
    debugging mixture/packing pipelines without carrying the source text
    alongside the ids.

    EOS_ID renders as a word boundary (packed sequences separate docs
    with it); UNK_ID renders as U+FFFD so lossiness is visible, never
    silent.  Null arrays stay null; a null/out-of-vocab id inside an
    array also renders U+FFFD."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    inv = {i: s for s, i in vocab.items()}
    inv[EOS_ID] = _EOW  # sequence boundary -> whitespace, like a word end
    globals().setdefault("pd", pd)

    @pandas_udf("string")
    def decode(s: pd.Series) -> pd.Series:
        import re

        # runs of boundaries (word-final EOW + EOS, or consecutive EOS)
        # collapse to ONE space — boundaries separate, they don't count
        bound = re.compile(f"{_EOW}+")

        def dec(ids):
            if ids is None:
                return None
            parts = [
                "�" if i is None else inv.get(int(i), "�")
                for i in ids
            ]
            return bound.sub(" ", "".join(parts)).strip()

        return s.map(dec)

    return decode
