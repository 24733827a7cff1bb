"""Multimodal column plumbing (SURVEY.md B13; north-star "multimodal columns").

A multimodal record is one row: text + dense vector + typed metadata +
opaque ``binary`` payloads (image/audio/video bytes).  The Spark-side
contract — schema, partition-friendly layout, Arrow batch shape through
``mapInPandas`` — is fully real here; the actual media decoding is stubbed
(decode libs are not in this container) behind ``NotImplementedError`` /
a deterministic fake, clearly marked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# One row per asset: id + modality tag + opaque bytes + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),     # opaque encoded bytes
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def pack_multimodal(docs: DataFrame, vectors: DataFrame,
                    doc_id: str = "doc_id", vec_id: str = "vec_id") -> DataFrame:
    """Assemble the single-row multimodal record: struct(text meta) +
    embedding + synthesized binary payload column (deterministic bytes from
    the text, standing in for real media)."""
    return (
        docs.join(vectors, docs[doc_id] == vectors[vec_id])
        .select(
            docs[doc_id].alias("asset_id"),
            F.struct(
                docs["text"].alias("text"),
                docs["lang"].alias("lang"),
                docs["source"].alias("source"),
            ).alias("doc"),
            vectors["embedding"].alias("embedding"),
            F.encode(docs["text"], "UTF-8").cast("binary").alias("payload"),
            F.create_map(F.lit("codec"), F.lit("utf8-fake")).alias("meta"),
        )
    )


def decode_image(payload: bytes):  # pragma: no cover - intentional stub
    """STUB: real image decode (PIL/opencv) is unavailable in this container.
    The Spark plumbing calls ``fake_feature`` instead in tests."""
    raise NotImplementedError("image decoding requires PIL/opencv — not installed")


def fake_feature(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature extractor: byte-histogram moments.
    Replace with a real decoder + model at deployment; signature and batch
    shape are identical."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = max(len(payload), 1)
    return [round(a / n, 6) for a in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``: iterator of
    pandas batches in, iterator out — per-batch vectorized, per-executor
    init possible (load the model once per worker here, as in
    functions.embedding)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"] if "modality" in pdf else "image",
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feature": pdf["payload"].map(lambda p: fake_feature(p, dim)),
                }
            )

    cols = [c for c in ("asset_id", "modality", "payload") if c in media.columns]
    src = media.select(*cols)
    if "modality" not in media.columns:
        src = src.withColumn("modality", F.lit("image"))
    return src.mapInPandas(batches, schema=FEATURE_SCHEMA)
