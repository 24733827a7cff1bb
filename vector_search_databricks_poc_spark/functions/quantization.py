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
    """Returns (scale, qvec) columns for a float-array column."""
    v = (F.col(vec) if isinstance(vec, str) else vec).cast("array<double>")
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(absmax != 0, absmax / 127.0).otherwise(F.lit(1.0))
    qvec = F.transform(v, lambda x: F.round(x / scale).cast("tinyint"))
    return scale.cast("float").alias("q_scale"), qvec.alias("q_vec")


def dequantize(scale: Column | str, qvec: Column | str) -> Column:
    s = (F.col(scale) if isinstance(scale, str) else scale).cast("double")
    q = F.col(qvec) if isinstance(qvec, str) else qvec
    return F.transform(q, lambda x: x.cast("double") * s)


def quantize_table(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Replace the float vector with (q_scale, q_vec) — 4x smaller at rest."""
    scale, qvec = quantize(vec_col)
    return df.withColumns({"q_scale": scale, "q_vec": qvec}).drop(vec_col)


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
    ) -> "PqCodebook":
        """Fit one KMeans per subspace (on a seeded sample at scale)."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        dim = len(df.select(vec_col).first()[0])
        assert dim % m == 0, f"dim {dim} not divisible by m={m}"
        sub = dim // m
        src = df if sample_fraction >= 1.0 else df.sample(sample_fraction, seed=seed)
        src = src.select(F.col(vec_col).cast("array<double>").alias("_v")).cache()
        centroids = []
        for j in range(m):
            feats = src.select(
                array_to_vector(F.slice("_v", j * sub + 1, sub)).alias("_f")
            )
            model = KMeans(k=k, seed=seed + j, featuresCol="_f").fit(feats)
            centroids.append(
                [
                    (c.tolist() if hasattr(c, "tolist") else c.toArray().tolist())
                    for c in model.clusterCenters()
                ]
            )
        src.unpersist()
        return cls(m, k, dim, centroids)

    def _sub_codebook_col(self, j: int) -> Column:
        return F.array(
            *[
                F.array(*[F.lit(float(x)) for x in cent])
                for cent in self.centroids[j]
            ]
        )

    def encode(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Append ``pq_code`` (array<int>, length m): nearest sub-centroid
        per subspace, chosen by a pure expression over the broadcast
        literal codebook."""
        v = F.col(vec_col).cast("array<double>")
        codes = []
        for j in range(self.m):
            subv = F.slice(v, j * self.sub + 1, self.sub)
            cb = self._sub_codebook_col(j)
            d2 = F.transform(
                cb,
                lambda c: F.aggregate(
                    F.zip_with(subv, c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
            )
            codes.append((F.array_position(d2, F.array_min(d2)) - 1).cast("int"))
        return df.withColumn("pq_code", F.array(*codes))

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
