"""Text-embedding operators (SURVEY.md B5 — the A7/A12 port).

The reference embeds with a Hugging Face model inside a scalar ``pandas_udf``
(syntetic_data.py:135-169): tokenizer -> forward pass -> masked mean pooling
(sum(token_emb*mask,1) / clamp(sum(mask,1), 1e-9)).  Its anti-patterns at
scale (driver-global model captured in the closure; hand-rolled BATCH_SIZE=2
micro-batching, syntetic_data_arxiv.py:198) are fixed here:

- the encoder is **pluggable**: a deterministic hashing encoder (pure
  Catalyst expressions, test path / no model deps) and a transformer
  encoder behind the same signature (lazy per-executor-process init,
  Arrow-batch sized via spark.sql.execution.arrow.maxRecordsPerBatch);
- both corpus and query embedding go through the same function (the
  reference duplicates the pooling logic on the driver,
  query_endpoint.py:83-115).
"""

from __future__ import annotations

import functools as _functools
import math

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, FloatType

from ..operators.text import tokens

# Per-Python-worker encoder singleton.  A MODULE attribute, looked up via
# import inside the UDF: cloudpickle rebuilds the UDF's function-globals
# dict on every task deserialization, so a closure-level `global` cache
# would reload the model once per TASK; the module object survives for
# the worker process lifetime (spark.python.worker.reuse default true).
_ENCODER_CACHE: dict = {}


@_functools.lru_cache(maxsize=65536)
def _portable_token_hash(tok: str) -> int:
    """Python twin of operators.dedup.portable_string_hash — the
    polynomial fold acc = (acc*131 + codepoint) mod (2^31-1), bit-exact
    (pure integer arithmetic; Spark's substring/ascii walk code points
    exactly like Python's str).  Module-level lru_cache: natural-language
    token streams are Zipf-distributed, so the hot vocabulary becomes a
    dict hit per occurrence (same per-worker memo pattern as
    multivec._token_vec_cached)."""
    acc = 0
    for ch in tok:
        acc = (acc * 131 + ord(ch)) % 2_147_483_647
    return acc


def _hash_fold_pandas(dim: int, normalize: bool, sign_bit: int, hash_in_python: bool = False):
    """Arrow-vectorized bucket fold for the hashing-trick embedding: takes
    the per-row ``array<long>`` of TOKEN HASHES (computed JVM-side, where
    xxhash64 / the polynomial hash are cheap codegen) and folds them into
    the signed dim-bucket vector in numpy.

    Why a Python boundary at all (guide §4.2): the pure-expression fold is
    O(dim x n_tokens) INTERPRETED higher-order-function work per row
    (immutable array accumulators make every formulation copy or rescan
    the dim-array per token) — measured as the dominant stage of every
    corpus-scale embed.  Here the fold is O(n_tokens) vectorized adds
    (np.add.at) plus one O(dim) normalize, and only one narrow long-array
    column crosses the boundary each way.

    Bit-identity with the old expression fold is structural, not hoped
    for: bucket weights are sums of +/-1.0 — small integers, exact in
    doubles at ANY accumulation order — so the pre-normalization vector
    is exactly equal; norm^2 is a sum of integer squares (exact), sqrt
    and the per-element division are single correctly-rounded IEEE ops in
    both engines.  The DuckDB oracles that recompute these embeddings
    (portable_embed_search and friends) stay hash-green (driver-checked).
    """
    import numpy as np
    import pandas as pd

    # NOTE: no parameter annotations (same reason as the transformer UDF
    # below): `from __future__ import annotations` stringifies hints,
    # which breaks pandas_udf eval-type inference; the explicit
    # returnType + default SCALAR eval type suffice.
    @F.pandas_udf(ArrayType(DoubleType()))
    def _fold(s):
        out = [None] * len(s)
        if hash_in_python:
            # portable variant: rows are token-STRING arrays (the JVM
            # expression for the polynomial hash nests a lambda that
            # captures the outer lambda's variable, which defeats
            # PythonUDF extraction in union/set-op branches — so the
            # hash itself moves here, memoized per worker)
            th = _portable_token_hash
            live = [
                (i, np.fromiter((th(t) for t in v), dtype=np.int64, count=len(v)))
                for i, v in enumerate(s)
                if v is not None
            ]
        else:
            live = [(i, np.asarray(v, dtype=np.int64)) for i, v in enumerate(s) if v is not None]
        if not live:
            return pd.Series(out)
        idx = [i for i, _ in live]
        arrs = [a for _, a in live]
        lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=len(arrs))
        acc = np.zeros((len(arrs), dim), dtype=np.float64)
        if int(lens.sum()):
            flat = np.concatenate(arrs)
            rows = np.repeat(np.arange(len(arrs)), lens)
            bucket = flat % dim  # numpy % == Spark pmod for int64
            sign = np.where(((flat >> sign_bit) & 1) == 1, 1.0, -1.0)
            np.add.at(acc, (rows, bucket), sign)
        if normalize:
            n2 = np.einsum("ij,ij->i", acc, acc)  # integer-valued: exact
            nz = n2 != 0.0
            acc[nz] /= np.sqrt(n2[nz])[:, None]
        vecs = acc.tolist()
        for j, i in enumerate(idx):
            out[i] = vecs[j]
        return pd.Series(out)

    return _fold


def hashing_embedding(
    text: Column | str, dim: int = 64, normalize: bool = True, portable: bool = False
) -> Column:
    """Deterministic hashing-trick embedding: token hashing in Catalyst,
    bucket fold Arrow-vectorized in numpy.

    Each token hashes to a bucket (xxhash64 mod dim) with sign from a second
    hash bit — the classic signed feature-hashing map — then the vector is
    L2-normalized.  Tokenization + per-token hashing stay JVM-side
    (codegen); the fold crosses to numpy as one ``array<long>`` column per
    row (see :func:`_hash_fold_pandas` for the cost argument and the
    bit-identity proof vs the pre-r10 pure-expression fold).

    ``portable=True`` swaps xxhash64 for the polynomial token hash
    (operators.dedup.portable_string_hash) so the DuckDB oracle can
    recompute the embedding — the hook that makes the whole
    embed->similarity-search pipeline oracle-checkable.
    """
    t = tokens(text)
    # bucket = |h| % dim ; sign from a high-ish bit independent of the
    # bucket (bit 62 for xxhash64; bit 15 for the 31-bit portable hash).
    # xxhash64 hashing stays JVM-side (cheap codegen; only the long array
    # crosses).  The PORTABLE polynomial hash moves into the same Python
    # worker as the fold: its expression form nests a lambda capturing
    # the outer lambda's token variable, which Spark's PythonUDF
    # extraction cannot lift out of union/set-op branches (runtime
    # INTERNAL_ERROR 'Cannot evaluate expression' on e.g. exceptAll) —
    # and the Python twin is bit-exact integer arithmetic anyway.
    sign_bit = 15 if portable else 62
    if portable:
        h = t
    else:
        h = F.transform(t, lambda tok: F.xxhash64(tok))
    # NULL text -> NULL embedding, not an array of dim NULL elements: the
    # element-NULL form passes size()==dim validity checks (vec_dim_ok)
    # and then poisons every downstream cosine/dot with NULL scores.
    # NULL propagates NATURALLY here (tokens(NULL) -> NULL array -> the
    # fold returns None) — no when() wrapper, which would also leave the
    # PythonUDF inside a CaseWhen that some operator positions (grouping
    # keys, set-op hashing) cannot extract into an ArrowEvalPython node.
    return _hash_fold_pandas(dim, normalize, sign_bit, hash_in_python=portable)(
        h
    ).cast(ArrayType(FloatType()))


def masked_mean_pool(last_hidden_state, attention_mask):
    """The reference's masked mean pooling as pure numpy — the numerical
    contract of the transformer encoder (syntetic_data.py:158-163):

        mask = attention_mask expanded over the hidden dim
        pooled = sum(token_emb * mask, axis=1) / clamp(sum(mask, axis=1), 1e-9)

    Factored out of the UDF so the math is golden-testable without torch
    (the env lacks it); the UDF feeds it the model's numpy activations.

    ``last_hidden_state``: (batch, seq, hidden) float array;
    ``attention_mask``: (batch, seq) 0/1 array.  Returns (batch, hidden).
    """
    import numpy as np

    h = np.asarray(last_hidden_state, dtype=np.float64)
    m = np.asarray(attention_mask, dtype=np.float64)[:, :, None]
    summed = (h * m).sum(axis=1)
    counts = np.clip(m.sum(axis=1), 1e-9, None)  # torch .clamp(min=1e-9)
    return summed / counts


def make_transformer_encoder_udf(
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
):
    """Transformer embedding as a scalar pandas_udf (the A7 port).

    Mirrors the reference's semantics — tokenizer(padding, truncation) ->
    no-grad forward -> masked mean pooling with clamp(min=1e-9)
    (syntetic_data.py:148-163) — with the scale fixes: the model loads
    lazily ONCE PER EXECUTOR PYTHON WORKER (cache resolved through the
    imported module so it survives task re-deserialization — a bare
    function-global would reload per task; never pickled from the
    driver), and batching is Arrow's, not a hand-rolled BATCH_SIZE=2 loop.

    The transformers/torch stack is not installed in this container, so the
    UDF raises ImportError at first execution unless the libs are present;
    the Spark-side plumbing (signature, schema, lazy-init pattern) is real
    and tested via the deterministic fake in tests.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NOTE: no parameter annotations here — `from __future__ import
    # annotations` stringifies hints, which breaks pandas_udf eval-type
    # inference; the explicit returnType + default SCALAR type suffice.
    @pandas_udf(ArrayType(FloatType()))
    def embed(texts):
        # resolve the cache through the imported MODULE (worker-lifetime),
        # not the pickled closure's globals (task-lifetime); fall back to
        # a function-global only if the package isn't importable on the
        # worker (still correct, just per-task reload)
        try:
            from vector_search_databricks_poc_spark.functions import (
                embedding as _mod,
            )

            cache = _mod._ENCODER_CACHE
        except ImportError:  # pragma: no cover - package not shipped
            global _ENCODER_FALLBACK_CACHE
            try:
                cache = _ENCODER_FALLBACK_CACHE
            except NameError:
                cache = _ENCODER_FALLBACK_CACHE = {}
        if model_name not in cache:
            try:
                import torch  # noqa: F401
                from transformers import AutoModel, AutoTokenizer
            except ImportError as e:  # pragma: no cover - environment-dependent
                raise ImportError(
                    "transformer encoder requires `torch` and `transformers`; "
                    "use hashing_embedding for a dependency-free encoder"
                ) from e
            tok = AutoTokenizer.from_pretrained(model_name)
            model = AutoModel.from_pretrained(model_name)
            model.eval()
            cache[model_name] = (tok, model)
        tok, model = cache[model_name]
        import torch

        enc = tok(
            texts.fillna("").tolist(),
            padding=True,
            truncation=True,
            max_length=512,
            return_tensors="pt",
        )
        with torch.no_grad():
            out = model(**enc)
        # masked mean pooling, clamp 1e-9 (reference syntetic_data.py:158-163)
        # — the math lives in masked_mean_pool so it's testable without torch
        vecs = masked_mean_pool(
            out.last_hidden_state.cpu().numpy(), enc["attention_mask"].cpu().numpy()
        )
        return pd.Series([v.astype("float32").tolist() for v in vecs])

    return embed


def embed_text(df, text_col: str = "text", out_col: str = "embedding",
               encoder: str = "hashing", dim: int = 64):
    """Append an embedding column (A8's ``withColumn`` append) with the
    chosen encoder."""
    from ..catalog import ensure_parallelism

    df = ensure_parallelism(df)
    if encoder == "hashing":
        return df.withColumn(out_col, hashing_embedding(text_col, dim=dim))
    if encoder == "transformer":
        udf = make_transformer_encoder_udf()
        return df.withColumn(out_col, udf(F.col(text_col)))
    raise ValueError(f"unknown encoder {encoder!r}")
