"""Binary (sign-bit) vector quantization: 1 bit/dim Hamming prefilter.

The coarsest rung of the compression ladder (int8 -> PQ -> binary,
functions/quantization.py for the first two): each dimension keeps only
its sign relative to the corpus mean, packed 64 dims per BIGINT — a
64-float embedding becomes ONE long (64x smaller).  Candidate ranking is
Hamming distance (``bit_count(a XOR b)``), which estimates the angle via
P(sign differs) = theta/pi (the SRP/SimHash identity, Charikar 2002,
with the identity basis; binary quantization in this form is the BQ mode
of production vector stores).  Exactness comes from the full-precision
rerank of the over-fetched survivors, same contract as the PCA and PQ
rungs.

Everything row-wise is a codegen expression — packing, XOR, bit_count —
no Python in the scan path.  At 100 TB: persist the packed column once
(engine pattern: ``binary_quantize_table`` then save); stage 1 then scans
~1.5 TB of longs instead of 100 TB of floats, and stage 2 fetches only
k * over_fetch full vectors.

The fit is a single mean-vector aggregation (Arrow-batched partial sums,
one tree agg) — the KMeans/CREATE INDEX analog, eager by contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import vectors as V

__all__ = [
    "mean_vector",
    "pack_bits_expr",
    "hamming_expr",
    "binary_quantize_table",
    "binary_search",
]


def mean_vector(df: DataFrame, vec_col: str = "embedding") -> list[float]:
    """Elementwise mean of a vector column: per-partition numpy partial
    sums (Arrow-batched), one final agg — corpus-size-independent result."""
    import numpy as np

    src = df.select(F.col(vec_col).cast("array<double>").alias("v")).where(
        F.col("v").isNotNull()
    )

    def _partials(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf):
                X = np.array(pdf["v"].tolist(), dtype=np.float64)
                yield pd.DataFrame({"n": [len(X)], "s": [X.sum(axis=0).tolist()]})

    row = (
        src.mapInPandas(_partials, "n long, s array<double>")
        .agg(
            F.sum("n").alias("n"),
            F.aggregate(
                F.collect_list("s"),
                F.expr("cast(null as array<double>)"),
                lambda acc, x: F.when(acc.isNull(), x).otherwise(
                    F.zip_with(acc, x, lambda a, b: a + b)
                ),
            ).alias("s"),
        )
        .first()
    )
    if row is None or not row["n"]:
        raise ValueError("mean_vector needs at least one non-null vector")
    return [float(x) / row["n"] for x in row["s"]]


def pack_bits_expr(vec: Column | str, mean: list[float]) -> Column:
    """``array<long>`` of ceil(d/64) words; bit j of word w is set iff
    ``vec[64w+j] > mean[64w+j]``.  Pure codegen (sequence/aggregate/
    shiftleft) — no UDF."""
    v = (F.col(vec) if isinstance(vec, str) else vec).cast("array<double>")
    d = len(mean)
    n_words = (d + 63) // 64
    centered = F.zip_with(v, F.lit(mean), lambda x, mu: x - mu)
    words = []
    for w in range(n_words):
        acc = F.lit(0).cast("long")
        for j in range(64):
            i = w * 64 + j
            if i >= d:
                break
            # bit j as a signed-long literal (j=63 is the sign bit)
            bit = (1 << j) if j < 63 else -(1 << 63)
            acc = acc + F.when(
                F.element_at(centered, i + 1) > 0, F.lit(bit).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        words.append(acc)
    return F.array(*words)


def hamming_expr(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two packed ``array<long>`` sketches."""
    aa = F.col(a) if isinstance(a, str) else a
    bb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(aa, bb, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def binary_quantize_table(
    df: DataFrame, mean: list[float], vec_col: str = "embedding", bits_col: str = "bits"
) -> DataFrame:
    """Append the packed sign sketch; persist this (without ``vec_col``)
    as the stage-1 table at scale."""
    return df.withColumn(bits_col, pack_bits_expr(vec_col, mean))


def binary_search(
    corpus: DataFrame,
    mean: list[float],
    query_vector: list[float],
    k: int = 10,
    over_fetch: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits_col: str | None = None,
) -> DataFrame:
    """Two-stage top-k cosine: Hamming-ranked candidates (ties to id) via
    TakeOrderedAndProject, exact full-precision rerank.  Pass ``bits_col``
    when the corpus already carries a persisted sketch; otherwise it is
    packed in-plan (one scan, still codegen).

    Output: ``id_col, score`` (exact cosine, 6dp), descending, k rows."""
    q = [float(x) for x in query_vector]
    qb = _pack_python(q, mean)
    bits = F.col(bits_col) if bits_col else pack_bits_expr(vec_col, mean)
    staged = corpus.select(
        F.col(id_col), F.col(vec_col), hamming_expr(bits, F.lit(qb)).alias("_ham")
    )
    cand = staged.orderBy(F.asc("_ham"), F.asc(id_col)).limit(k * over_fetch)
    rescored = cand.withColumn(
        "score",
        F.round(V.cosine(F.col(vec_col).cast("array<double>"), V.lit_vector(q)), 6),
    )
    return rescored.select(id_col, "score").orderBy(
        F.desc("score"), F.asc(id_col)
    ).limit(k)


def _pack_python(vec: list[float], mean: list[float]) -> list[int]:
    """Driver-side twin of pack_bits_expr for the query literal."""
    d = len(mean)
    words = [0] * ((d + 63) // 64)
    for i, (x, m) in enumerate(zip(vec, mean)):
        if x - m > 0:
            words[i // 64] |= 1 << (i % 64)
    # to signed 64-bit (Spark longs)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]
