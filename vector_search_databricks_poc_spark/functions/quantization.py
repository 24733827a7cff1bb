"""Vector quantization (100 TB storage/bandwidth lever).

At scale the embedding column dominates table size; int8 scalar quantization
cuts it 4x with ~1% recall loss for cosine top-k.  Pure expressions — the
quantized column is an ordinary ``array<tinyint>`` parquet column, so all
the engine's join/index machinery applies unchanged.

Scheme: symmetric per-vector scale s = max(|x|)/127; q_i = round(x_i / s);
stored as (scale float, qvec array<tinyint>).  Dequantize: x_i ~ q_i * s.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(vec: Column | str) -> tuple[Column, Column]:
    """Returns (scale, qvec) columns for a float-array column.

    NOTE: the returned qvec embeds the scale expression inside its
    per-element lambda; higher-order functions run interpreted with no
    CSE across invocations, so the full-vector absmax re-evaluates for
    every element (O(dim^2) per row).  Fine for one-off expressions;
    the corpus-sized pass should use :func:`quantize_table`, which
    materializes the scale as a column first."""
    v = (F.col(vec) if isinstance(vec, str) else vec).cast("array<double>")
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # divide by the float32-ROUNDED scale (the one actually stored) so
    # this path and quantize_table produce identical codes — dividing by
    # the double scale could flip F.round at a .5 boundary vs the stored
    # divisor, inflating reconstruction error asymmetrically
    scale = (
        F.when(absmax != 0, absmax / 127.0).otherwise(F.lit(1.0)).cast("float")
    )
    qvec = F.transform(v, lambda x: F.round(x / scale.cast("double")).cast("tinyint"))
    return scale.alias("q_scale"), qvec.alias("q_vec")


def dequantize(scale: Column | str, qvec: Column | str) -> Column:
    s = (F.col(scale) if isinstance(scale, str) else scale).cast("double")
    q = F.col(qvec) if isinstance(qvec, str) else qvec
    return F.transform(q, lambda x: x.cast("double") * s)


def quantize_table(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Replace the float vector with (q_scale, q_vec) — 4x smaller at rest.

    Two-step so the per-row scale is computed ONCE as a real column and
    the element lambda divides by ``F.col("q_scale")`` — O(dim) per row
    instead of O(dim^2) (the scale expression re-evaluated per element
    under interpreted higher-order functions)."""
    v = F.col(vec_col).cast("array<double>")
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(absmax != 0, absmax / 127.0).otherwise(F.lit(1.0))
    out = df.withColumn("q_scale", scale.cast("float"))
    qvec = F.transform(
        v, lambda x: F.round(x / F.col("q_scale").cast("double")).cast("tinyint")
    )
    return out.withColumn("q_vec", qvec).drop(vec_col)


class PqCodebook:
    """Product quantization: split the vector into ``m`` subspaces, KMeans
    each subspace to ``k`` centroids, store each vector as ``m`` byte codes
    (64-dim float32 -> 8 bytes at m=8: 32x compression).

    Search uses asymmetric distance computation (ADC): per query, a
    (m x k) lookup table of query-subvector->centroid dot products is
    precomputed once, and each corpus vector's score is m table lookups —
    no float math per dimension.  All executor-side work is expressions
    over broadcast literal codebooks.
    """

    def __init__(self, m: int, k: int, dim: int, centroids: list[list[list[float]]]):
        self.m = m
        self.k = k
        self.dim = dim
        self.sub = dim // m
        self.centroids = centroids  # [m][k][sub]

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        vec_col: str = "embedding",
        m: int = 8,
        k: int = 16,
        seed: int = 42,
        sample_fraction: float = 1.0,
        max_train_rows: int = 65536,
    ) -> "PqCodebook":
        """Fit per-subspace centroids with vectorized Lloyd's iterations on
        a bounded driver-side sample.

        PQ codebooks are trained on samples at ANY corpus size (m*k*sub
        floats of output; FAISS trains on 10^4-10^6 vectors) — so the fit
        collects at most ``max_train_rows`` sampled rows and runs numpy
        k-means per subspace.  One Spark job total, versus one distributed
        KMeans fit per subspace; only the ENCODE pass is corpus-sized and
        that stays distributed."""
        import math

        import numpy as np

        src = df if sample_fraction >= 1.0 else df.sample(sample_fraction, seed=seed)
        # ONE evaluation per row (a single collect), with all validity
        # filtering driver-side on the bounded sample: filtering with
        # size()/exists() expressions here would re-evaluate the vector
        # expression per element when ``vec_col`` is an unmaterialized
        # embedding (interpreted HOFs share no CSE) — observed as an
        # hours-long single task on a 200-row fixture
        rows = (
            src.select(F.col(vec_col).cast("array<double>").alias("_v"))
            .limit(max_train_rows)
            .collect()
        )
        # null / ragged / null-element vectors must not crash the fit —
        # the same contract encode() honors row-wise
        vecs = []
        dim = None
        for r in rows:
            v = r["_v"]
            if v is None or any(x is None for x in v):
                continue
            if dim is None:
                dim = len(v)
            if len(v) == dim and not any(math.isnan(x) for x in v):
                vecs.append(v)
        if dim is None or not vecs:
            raise ValueError("PqCodebook.fit: no valid vectors to train on")
        assert dim % m == 0, f"dim {dim} not divisible by m={m}"
        sub = dim // m
        X = np.asarray(vecs, dtype="float64")
        centroids = [
            cls._lloyd(X[:, j * sub : (j + 1) * sub], k, seed + j).tolist()
            for j in range(m)
        ]
        return cls(m, k, dim, centroids)

    @staticmethod
    def _lloyd(X, k: int, seed: int, iters: int = 25):
        """Deterministic vectorized Lloyd's with k-means++ seeding; empty
        clusters keep their previous center, early-stops when assignments
        stabilize."""
        import numpy as np

        rng = np.random.RandomState(seed)
        uniq = np.unique(X, axis=0)
        if len(uniq) == 0:
            return np.zeros((k, X.shape[1]))
        if len(uniq) <= k:
            C = uniq[rng.choice(len(uniq), k, replace=True)].astype("float64")
        else:
            # k-means++: spread the seeds ~ D^2
            C = np.empty((k, X.shape[1]), dtype="float64")
            C[0] = uniq[rng.randint(len(uniq))]
            d2 = ((uniq - C[0]) ** 2).sum(-1)
            for i in range(1, k):
                tot = d2.sum()
                if tot <= 0:
                    C[i] = uniq[rng.randint(len(uniq))]
                else:
                    C[i] = uniq[rng.choice(len(uniq), p=d2 / tot)]
                d2 = np.minimum(d2, ((uniq - C[i]) ** 2).sum(-1))
        prev = None
        for _ in range(iters):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            if prev is not None and np.array_equal(assign, prev):
                break
            prev = assign
            for c in range(k):
                pts = X[assign == c]
                if len(pts):
                    C[c] = pts.mean(0)
        return C

    def encode(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Append ``pq_code`` (array<int>, length m): nearest sub-centroid
        per subspace.

        Arrow-batched pandas UDF with the (m, k, sub) codebook as a numpy
        closure: the corpus-sized encode pass is one vectorized argmin per
        batch instead of m*k interpreted higher-order-function evaluations
        per row (ties broken toward the lowest code, same as the
        array_position(array_min) expression it replaces)."""
        import numpy as np
        import pandas as pd

        cb = np.asarray(self.centroids, dtype="float64")  # [m, k, sub]
        m, _k, sub = cb.shape
        dim = m * sub
        # per-subspace ||c||^2, precomputed once for the matmul expansion
        cb_norm = (cb * cb).sum(-1)  # [m, k]

        def _row(v):
            # NULL, wrong-dimension, or null-element vectors encode to
            # NULL codes instead of killing the task (one bad row must
            # not kill a 100 TB encode)
            if v is None or len(v) != dim:
                return None
            try:
                a = np.asarray(v, dtype="float64")
            except (TypeError, ValueError):
                return None  # a NULL element (plain-Python path)
            # Arrow hands a NULL element over as NaN — same bad row,
            # different spelling; NaN distances would argmin to code 0
            return None if np.isnan(a).any() else a

        def _enc(s):
            arrs = [_row(v) for v in s]
            vals = [a for a in arrs if a is not None]
            out: list = [None] * len(s)
            if vals:
                X = np.asarray(vals)  # [n, dim]
                codes = np.empty((len(X), m), dtype="int32")
                # argmin ||x - c||^2 == argmin (||c||^2 - 2 x.c): the
                # matmul expansion keeps memory at O(n*k) per subspace —
                # the broadcast (X - cb)**2 form allocated n*m*k*sub
                # doubles per batch (~150 GB at batch 10k, dim 768, k 256)
                for j in range(m):
                    Xj = X[:, j * sub : (j + 1) * sub]
                    d = cb_norm[j][None, :] - 2.0 * (Xj @ cb[j].T)
                    codes[:, j] = d.argmin(1)
                it = iter(codes)
                out = [
                    next(it).tolist() if a is not None else None for a in arrs
                ]
            return pd.Series(out, dtype=object)

        enc = F.pandas_udf(_enc, "array<int>")
        return df.withColumn("pq_code", enc(F.col(vec_col).cast("array<double>")))

    def adc_score(self, query: list[float]) -> Column:
        """ADC dot-product score of a ``pq_code`` column against ``query``:
        per subspace, lookup table of dot(query_sub, centroid) built
        driver-side (m*k floats), score = sum of m lookups."""
        score = F.lit(0.0)
        for j in range(self.m):
            qsub = query[j * self.sub : (j + 1) * self.sub]
            table = [
                sum(a * b for a, b in zip(qsub, cent)) for cent in self.centroids[j]
            ]
            lut = F.array(*[F.lit(float(x)) for x in table])
            score = score + F.element_at(lut, F.element_at("pq_code", j + 1) + 1)
        return score


def quantized_dot(
    a_scale: Column | str, a_q: Column | str, b_scale: Column | str, b_q: Column | str
) -> Column:
    """Dot product directly in the quantized domain: int8 multiply-adds,
    one float multiply at the end — the cheap first stage before exact
    rescoring of survivors."""
    aq = F.col(a_q) if isinstance(a_q, str) else a_q
    bq = F.col(b_q) if isinstance(b_q, str) else b_q
    int_dot = F.aggregate(
        F.zip_with(aq, bq, lambda x, y: (x.cast("int") * y.cast("int")).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sa = (F.col(a_scale) if isinstance(a_scale, str) else a_scale).cast("double")
    sb = (F.col(b_scale) if isinstance(b_scale, str) else b_scale).cast("double")
    return int_dot.cast("double") * sa * sb
