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

import math

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from ..operators.text import tokens

# Per-Python-worker encoder singleton.  A MODULE attribute, looked up via
# import inside the UDF: cloudpickle rebuilds the UDF's function-globals
# dict on every task deserialization, so a closure-level `global` cache
# would reload the model once per TASK; the module object survives for
# the worker process lifetime (spark.python.worker.reuse default true).
_ENCODER_CACHE: dict = {}


def hashing_embedding(
    text: Column | str, dim: int = 64, normalize: bool = True, portable: bool = False
) -> Column:
    """Deterministic hashing-trick embedding, pure Catalyst expressions.

    Each token hashes to a bucket (xxhash64 mod dim) with sign from a second
    hash bit — the classic signed feature-hashing map — then the vector is
    L2-normalized.  JVM-side, codegen-friendly, model-free: the engine's
    default test-path encoder (same role as HashingTF+Normalizer, without
    leaving Catalyst or bridging to VectorUDT).

    ``portable=True`` swaps xxhash64 for the polynomial token hash
    (operators.dedup.portable_string_hash) so the DuckDB oracle can
    recompute the embedding — the hook that makes the whole
    embed->similarity-search pipeline oracle-checkable.

    Cost note: the bucket fold is O(dim * n_tokens) interpreted-HOF work
    per row — unavoidable in pure expressions (immutable array
    accumulators make the 'one pass over tokens' form copy the dim-array
    per token, same product).  This encoder is the test/default path;
    corpus-scale embedding belongs to the Arrow-batched transformer UDF.
    """
    t = tokens(text)
    if portable:
        from ..operators.dedup import portable_string_hash

        h = F.transform(t, lambda tok: portable_string_hash(tok))
    else:
        h = F.transform(t, lambda tok: F.xxhash64(tok))
    # bucket = |h| % dim ; sign from a high-ish bit independent of the
    # bucket (bit 62 for xxhash64; bit 15 for the 31-bit portable hash)
    sign_bit = 15 if portable else 62
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.aggregate(
            h,
            F.lit(0.0),
            lambda acc, hv: acc
            + F.when(
                F.pmod(hv, F.lit(dim)) == d,
                F.when(F.shiftright(hv, sign_bit).bitwiseAND(F.lit(1)) == 1, 1.0).otherwise(-1.0),
            ).otherwise(0.0),
        ),
    )
    if normalize:
        norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
        vec = F.when(norm != 0, F.transform(vec, lambda x: x / norm)).otherwise(vec)
    # NULL text -> NULL embedding, not an array of dim NULL elements: the
    # element-NULL form passes size()==dim validity checks (vec_dim_ok)
    # and then poisons every downstream cosine/dot with NULL scores
    c = F.col(text) if isinstance(text, str) else text
    return F.when(c.isNotNull(), vec).cast(ArrayType(FloatType()))


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
