"""Bloom-guarded benchmark decontamination — the 100 TB shape when the
evaluation set itself is too big to broadcast exactly.

``operators/text.py::contaminated_ids`` broadcasts the benchmark's exact
n-gram hash set; perfect while eval sets are small.  When the "dirty"
side grows to billions of n-grams (every public benchmark + held-out
split), an exact broadcast set stops fitting, and the naive fallback —
a shuffle join of 100 TB of corpus n-grams against the benchmark — is
the most expensive plan in the pipeline.  The standard fix (e.g. Spark's
own runtime row-level filtering, BloomFilterAggregate) is:

1. build a Bloom filter over the benchmark n-gram hashes — built
   DISTRIBUTEDLY: one partial bitmap per partition via ``mapInPandas``
   (numpy bit ops), OR-merged on the driver.  Driver cost is
   ``n_partitions × m/8`` bytes streamed, never the n-gram set itself;
2. broadcast the bitmap (``m/8`` bytes — 10 bits/key ≈ 1.2 GB per 10⁹
   keys, broadcastable where the exact set is not);
3. probe corpus n-grams with a vectorized ``pandas_udf`` (double
   hashing, k probes, numpy) — the 100 TB side is filtered IN PLACE,
   no shuffle, no join;
4. exact-verify ONLY the surviving candidate ids with the regular
   semi-join — Bloom false positives die here, and since a Bloom filter
   has no false negatives the final answer is EXACT (asserted equal to
   the broadcast-exact path in tests/test_text_hygiene.py).

Eager-by-contract: step 1 runs one Spark job over the benchmark side
(a CREATE-INDEX analog, like the IVF KMeans fit); the returned corpus
plan stays lazy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _probe_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(h), k) bit positions via double hashing — h1 + i*h2 mod m,
    all uint64 numpy, no Python loop over rows."""
    h = h.astype(np.uint64)
    h1 = h % np.uint64(m_bits)
    h2 = ((h >> np.uint64(33)) | np.uint64(1)) % np.uint64(m_bits)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def build_hash_bloom(hashes: DataFrame, m_bits: int = 1 << 20, k: int = 7) -> bytes:
    """Aggregate a DataFrame of int64 hashes (column ``_g``) into one
    Bloom bitmap.  One partial bitmap per partition (mapInPandas), OR
    merged on the driver — the driver never sees a hash, only bitmaps."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")

    def partial(it):
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        seen = False
        for pdf in it:
            if not len(pdf):
                continue
            seen = True
            pos = _probe_positions(pdf["_g"].to_numpy(), m_bits, k).ravel()
            np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    # toLocalIterator streams one partial bitmap at a time — peak driver
    # memory is 2 bitmaps, not n_partitions bitmaps
    for row in hashes.select("_g").mapInPandas(partial, "bm binary").toLocalIterator():
        acc |= np.frombuffer(row["bm"], dtype=np.uint8)
    return acc.tobytes()


def bloom_might_contain(bitmap: bytes, spark, m_bits: int, k: int):
    """Vectorized membership probe as a pandas_udf over a broadcast of
    the bitmap — every executor gets the bits once, rows never carry
    them."""
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def probe(h: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        pos = _probe_positions(h.to_numpy(), m_bits, k)
        hit = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    return probe


def bloom_contaminated_ids(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> DataFrame:
    """EXACT contaminated-id set via the Bloom-guarded plan (see module
    docstring).  Same answer as text.contaminated_ids — only the route
    differs: corpus n-grams are filtered in place by the broadcast
    bitmap, and the (rare) survivors are exact-verified by the semi-join
    the naive plan would have run over everything."""
    from .text import gram_hashes  # ONE hash definition with the exact route

    spark = df.sparkSession
    # checkpoint: the distinct-ed benchmark grams feed BOTH the bitmap
    # build (an action) and the verify semi-join — without the cut the
    # most expensive benchmark-side job would run twice
    bench = gram_hashes(benchmark, bench_text_col, n).distinct().localCheckpoint(
        eager=False
    )
    bitmap = build_hash_bloom(bench, m_bits=m_bits, k=k)  # eager: index build
    probe = bloom_might_contain(bitmap, spark, m_bits, k)

    corpus = gram_hashes(df, text_col, n, extra_cols=(id_col,))
    candidates = corpus.where(probe(F.col("_g")))
    # exact verification of survivors only: false positives die here, and
    # Bloom filters have no false negatives -> result is exact
    return candidates.join(bench, "_g", "left_semi").select(id_col).distinct()
