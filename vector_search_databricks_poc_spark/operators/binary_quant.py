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
    "binary_batch_search",
    "BinaryIndex",
    "build_binary_index",
]


def mean_vector(df: DataFrame, vec_col: str = "embedding") -> list[float]:
    """Elementwise mean of a vector column: ONE numpy partial per
    partition (Arrow-batched), merged by the parallel explode-and-SUM
    tree reduce (operators/_reduce.py — no collect_list buffer, no
    single-reducer fold) — corpus-size-independent result."""
    import numpy as np

    src = df.select(F.col(vec_col).cast("array<double>").alias("v")).where(
        F.col("v").isNotNull()
    )

    def _partials(batches):
        import pandas as pd

        n_acc, s_acc = 0, None
        for pdf in batches:
            if len(pdf):
                X = np.array(pdf["v"].tolist(), dtype=np.float64)
                n_acc += len(X)
                s_acc = X.sum(axis=0) if s_acc is None else s_acc + X.sum(axis=0)
        if n_acc:
            yield pd.DataFrame({"n": [n_acc], "s": [s_acc.tolist()]})

    from ._reduce import sum_partials

    parts = src.mapInPandas(_partials, "n long, s array<double>")
    n, sums = sum_partials(parts, ["s"])
    if not n:
        raise ValueError("mean_vector needs at least one non-null vector")
    return [float(x) / n for x in sums["s"]]


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


def _query_hamming_pandas(mean: list[float], qbits: list[int]):
    """Arrow-vectorized twin of ``hamming_expr(pack_bits_expr(vec, mean),
    lit(qbits))`` for the UNPACKED-corpus search path: one numpy pass
    packs each vector's sign bits against ``mean`` and pops the XOR count
    against the query sketch.

    Why: the expression form embeds a 64-term chained when/add tree PER
    WORD with the mean as a literal — Catalyst ANALYSIS of that tree cost
    a measured 1.5-5 s of driver time per fresh plan (the fixture scan
    itself is milliseconds), and the interpreted zip_with fold paid again
    at execution.  Bit-identity is trivial: sign bits come from the same
    IEEE float64 subtract-and-compare, and XOR/popcount are integer ops.
    NULL vectors stay NULL (same candidate-ordering semantics); vectors
    shorter/longer than ``mean`` contribute sign bits only for the
    positions both sides have, exactly like the zip_with form."""
    import numpy as np
    import pandas as pd

    d = len(mean)
    n_words = (d + 63) // 64
    mean_np = np.asarray(mean, dtype=np.float64)
    qb_np = np.asarray(qbits, dtype=np.int64)

    @F.pandas_udf("long")
    def _ham(s):
        out = [None] * len(s)
        for i, v in enumerate(s):
            if v is None:
                continue
            x = np.asarray(v, dtype=np.float64)
            n = min(x.size, d)
            pos = np.nonzero(x[:n] - mean_np[:n] > 0)[0]
            words = np.zeros(n_words, dtype=np.uint64)
            np.bitwise_or.at(
                words, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64)
            )
            x8 = (words ^ qb_np.view(np.uint64)).view(np.uint8)
            out[i] = int(np.unpackbits(x8).sum())
        return pd.Series(out, dtype="object")

    return _ham


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
    when the corpus already carries a persisted sketch (pure codegen XOR/
    bit_count scan); otherwise the sign-pack + Hamming runs as one Arrow
    numpy pass (see :func:`_query_hamming_pandas` for why the expression
    form lost: Catalyst analysis of the literal-mean when-tree dominated
    the whole query).

    Output: ``id_col, score`` (exact cosine, 6dp), descending, k rows."""
    q = [float(x) for x in query_vector]
    qb = _pack_python(q, mean)
    if bits_col:
        ham = hamming_expr(F.col(bits_col), F.lit(qb))
    else:
        ham = _query_hamming_pandas(mean, qb)(F.col(vec_col))
    staged = corpus.select(
        F.col(id_col), F.col(vec_col), ham.alias("_ham")
    )
    cand = staged.orderBy(F.asc("_ham"), F.asc(id_col)).limit(k * over_fetch)
    rescored = cand.withColumn(
        "score",
        F.round(V.cosine(F.col(vec_col).cast("array<double>"), V.lit_vector(q)), 6),
    )
    return rescored.select(id_col, "score").orderBy(
        F.desc("score"), F.asc(id_col)
    ).limit(k)


def binary_batch_search(
    queries: DataFrame,
    corpus: DataFrame,
    mean: list[float],
    k: int = 10,
    over_fetch: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits_col: str | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Many queries, one plan: the (small) query side gets its sketch
    packed in-plan and broadcasts into a single corpus scan; per-query
    Hamming rank keeps k*over_fetch, exact cosine rerank keeps k.
    Output: (query_id, id, score) with per-query rank <= k.

    One shuffle total (the per-query window rank); the corpus is scanned
    once for stage 1 — against a persisted ``bits_col`` table that scan
    is longs, not floats."""
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(query_vec_col).cast("array<double>").alias("_qv"),
            pack_bits_expr(query_vec_col, mean).alias("_qbits"),
        )
    )
    bits = F.col(bits_col) if bits_col else pack_bits_expr(vec_col, mean)
    staged = corpus.select(F.col(id_col), F.col(vec_col), bits.alias("_bits"))
    w_ham = Window.partitionBy(query_id_col).orderBy(F.asc("_ham"), F.asc(id_col))
    cand = (
        staged.join(q, F.lit(True))
        .withColumn("_ham", hamming_expr("_bits", F.col("_qbits")))
        .withColumn("_r", F.row_number().over(w_ham))
        .where(F.col("_r") <= k * over_fetch)
    )
    w_score = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        cand.withColumn(
            "score",
            F.round(V.cosine(F.col(vec_col).cast("array<double>"), F.col("_qv")), 6),
        )
        .withColumn("_rs", F.row_number().over(w_score))
        .where(F.col("_rs") <= k)
        .select(query_id_col, id_col, "score")
    )


class BinaryIndex:
    """Serving-facade handle for the binary rung: the packed-sketch table
    plus its mean, with the call shape of the other index kinds."""

    kind = "binary"

    def __init__(
        self,
        table: DataFrame,
        mean: list[float],
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        bits_col: str = "bits",
        over_fetch: int = 10,
    ):
        self.table = table
        self.mean = [float(x) for x in mean]
        self.id_col = id_col
        self.vec_col = vec_col
        self.bits_col = bits_col
        self.over_fetch = over_fetch
        self.expected_dim = len(mean)

    def search(self, query_vector, k: int = 10) -> DataFrame:
        return binary_search(
            self.table, self.mean, query_vector, k=k,
            over_fetch=self.over_fetch, id_col=self.id_col,
            vec_col=self.vec_col, bits_col=self.bits_col,
        )

    def batch_search(
        self, queries: DataFrame, k: int = 10,
        query_id_col: str = "query_id", query_vec_col: str = "query_vec",
    ) -> DataFrame:
        return binary_batch_search(
            queries, self.table, self.mean, k=k, over_fetch=self.over_fetch,
            id_col=self.id_col, vec_col=self.vec_col, bits_col=self.bits_col,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
        )


def build_binary_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    over_fetch: int = 10,
) -> BinaryIndex:
    """Fit the mean (one pass) and attach the packed sketch — the
    CREATE INDEX analog for the binary rung.  The sketch column is
    computed in-plan; persist ``index.table`` to make stage 1 scan
    longs at rest."""
    mean = mean_vector(df, vec_col)
    table = binary_quantize_table(df.select(id_col, vec_col), mean, vec_col)
    return BinaryIndex(table, mean, id_col=id_col, vec_col=vec_col,
                       over_fetch=over_fetch)


def _pack_python(vec: list[float], mean: list[float]) -> list[int]:
    """Driver-side twin of pack_bits_expr for the query literal."""
    d = len(mean)
    words = [0] * ((d + 63) // 64)
    for i, (x, m) in enumerate(zip(vec, mean)):
        if x - m > 0:
            words[i // 64] |= 1 << (i % 64)
    # to signed 64-bit (Spark longs)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]
