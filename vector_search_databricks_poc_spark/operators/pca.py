"""Distributed PCA + reduced-dimension two-stage vector search.

Dimensionality reduction is the other lever (besides PQ/int8, see
functions/quantization.py) for shrinking 100 TB of embeddings: project to
the top-k principal directions, run the cheap candidate search in k dims,
exact-rerank the survivors in full dimension (the ADC-style "reduce then
refine" pattern; PCA front-ends are standard in FAISS index factories,
Johnson et al. 2017, and Matryoshka-style truncated search, Kusupati et
al. 2022, is the learned cousin).

Spark-first fit: PCA needs only the sufficient statistics
(count, sum-vector, Gram matrix X^T X) — each partition accumulates ONE
d+d^2 partial with numpy passes inside ``mapInPandas`` (Arrow-batched,
no per-row Python), the partials reduce via a real parallel tree
(explode to (index, value), hash-aggregate SUM per index with map-side
combine — operators/_reduce.py; no collect_list buffer, no
single-reducer array fold), and the driver eigendecomposes the d x d
covariance (d is the embedding width, <= a few thousand — driver-sized
by definition; the corpus never leaves the executors).  Eigenvector sign
is canonicalized (largest-|component| coordinate made positive) so fits
are reproducible across partitionings.

Projection/search stay JVM-side: the k x d component matrix is a plan
literal and the matvec is a nested higher-order-function expression —
whole-stage codegen, no Python in the per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import vectors as V

__all__ = [
    "PcaModel",
    "fit_pca",
    "project_expr",
    "pca_reduced_search",
    "pca_batch_search",
    "PcaIndex",
    "build_pca_index",
]


class PcaModel:
    """Top-k principal directions of a vector column.

    ``components``: k x d (rows = directions, orthonormal);
    ``mean``: d; ``explained_variance``: k (eigenvalues, descending).
    """

    def __init__(self, components, mean, explained_variance):
        self.components = [[float(x) for x in row] for row in components]
        self.mean = [float(x) for x in mean]
        self.explained_variance = [float(v) for v in explained_variance]

    @property
    def k(self) -> int:
        return len(self.components)

    @property
    def dim(self) -> int:
        return len(self.mean)


def fit_pca(df: DataFrame, vec_col: str = "embedding", k: int = 16) -> PcaModel:
    """Fit PCA from one distributed pass of sufficient statistics.

    Eager by contract (a fit is the KMeans/CREATE INDEX analog): runs one
    Spark job whose result is d + d^2 numbers, independent of corpus
    size.  Null vectors are skipped; ragged dims raise (same contract as
    the IVF build)."""
    import numpy as np

    src = df.select(F.col(vec_col).cast("array<double>").alias("v")).where(
        F.col("v").isNotNull()
    )

    def _partials(batches):
        # ONE partial per partition (accumulated across Arrow batches),
        # so the reduce stage sees task-count rows, not batch-count rows
        import pandas as pd

        n_acc, s_acc, g_acc = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            if X.ndim != 2:
                raise ValueError("ragged embedding dimensions in PCA fit")
            n_acc += len(X)
            s_b, g_b = X.sum(axis=0), X.T @ X
            s_acc = s_b if s_acc is None else s_acc + s_b
            g_acc = g_b if g_acc is None else g_acc + g_b
        if n_acc:
            yield pd.DataFrame(
                {"n": [n_acc], "s": [s_acc.tolist()], "g": [g_acc.ravel().tolist()]}
            )

    from ._reduce import sum_partials

    parts = src.mapInPandas(_partials, "n long, s array<double>, g array<double>")
    n, sums = sum_partials(parts, ["s", "g"])
    if n < 2:
        raise ValueError("PCA fit needs at least 2 non-null vectors")
    s = np.array(sums["s"])
    d = len(s)
    gram = np.array(sums["g"]).reshape(d, d)
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    if k > d:
        raise ValueError(f"k={k} exceeds embedding dim {d}")
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k x d
    # deterministic sign: the largest-|x| coordinate of each direction > 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PcaModel(comps, mean, vals[order])


def project_expr(model: PcaModel, vec: Column | str) -> Column:
    """k-dim projection of ``vec`` as one codegen expression: center by
    the mean literal, then matvec with the component-matrix literal via
    transform+aggregate (no UDF)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    comp = F.lit(model.components)  # array<array<double>>, plan literal
    centered = F.zip_with(
        v.cast("array<double>"), F.lit(model.mean), lambda x, m: x - m
    )
    return F.transform(
        comp,
        lambda c: F.aggregate(
            F.zip_with(centered, c, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def pca_reduced_search(
    corpus: DataFrame,
    model: PcaModel,
    query_vector: list[float],
    k: int = 10,
    over_fetch: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage top-k cosine search: stage 1 ranks by negative euclidean
    distance in PCA space (distances are contracted, never expanded, by
    an orthonormal projection — the classic reduce-then-refine bound) and
    keeps ``k * over_fetch`` candidates with a TakeOrderedAndProject;
    stage 2 exactly rescores the survivors in full dimension.

    Output: ``id_col, score`` (exact cosine), descending, k rows.
    Approximate by construction — recall is measured, not assumed
    (tests/test_pca.py) — while stage 1 reads only the reduced column.
    """
    import numpy as np

    q = np.asarray(query_vector, dtype=np.float64)
    comps = np.array(model.components)
    qr = (comps @ (q - np.array(model.mean))).tolist()

    reduced = corpus.select(
        F.col(id_col), F.col(vec_col), project_expr(model, vec_col).alias("_r")
    )
    # negative squared euclidean distance in reduced space (monotone in
    # similarity for normalized corpora; cheap: k dims, codegen)
    stage1 = reduced.withColumn(
        "_near",
        -F.aggregate(
            F.zip_with(F.col("_r"), F.lit(qr), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    ).orderBy(F.desc("_near"), F.asc(id_col)).limit(k * over_fetch)


    rescored = stage1.withColumn(
        "score",
        F.round(
            V.cosine(F.col(vec_col).cast("array<double>"), V.lit_vector(q.tolist())),
            6,
        ),
    )
    return rescored.select(id_col, "score").orderBy(
        F.desc("score"), F.asc(id_col)
    ).limit(k)


def pca_batch_search(
    queries: DataFrame,
    corpus: DataFrame,
    model: PcaModel,
    k: int = 10,
    over_fetch: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Many queries, one plan: queries project to PCA space in-plan and
    broadcast into a single corpus scan; per-query reduced-space rank
    keeps k*over_fetch, exact cosine rerank keeps k.  Output:
    (query_id, id, score), per-query rank <= k.  One shuffle (the
    per-query window)."""
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(query_vec_col).cast("array<double>").alias("_qv"),
            project_expr(model, query_vec_col).alias("_qr"),
        )
    )
    staged = corpus.select(
        F.col(id_col), F.col(vec_col), project_expr(model, vec_col).alias("_r")
    )
    w_near = Window.partitionBy(query_id_col).orderBy(F.desc("_near"), F.asc(id_col))
    cand = (
        staged.join(q, F.lit(True))
        .withColumn(
            "_near",
            -F.aggregate(
                F.zip_with(F.col("_r"), F.col("_qr"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn("_rk", F.row_number().over(w_near))
        .where(F.col("_rk") <= k * over_fetch)
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


class PcaIndex:
    """Serving-facade handle for the reduce-then-refine rung."""

    kind = "pca"

    def __init__(
        self,
        table: DataFrame,
        model: PcaModel,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        over_fetch: int = 10,
    ):
        self.table = table
        self.model = model
        self.id_col = id_col
        self.vec_col = vec_col
        self.over_fetch = over_fetch
        self.expected_dim = model.dim

    def search(self, query_vector, k: int = 10) -> DataFrame:
        return pca_reduced_search(
            self.table, self.model, query_vector, k=k,
            over_fetch=self.over_fetch, id_col=self.id_col, vec_col=self.vec_col,
        )

    def batch_search(
        self, queries: DataFrame, k: int = 10,
        query_id_col: str = "query_id", query_vec_col: str = "query_vec",
    ) -> DataFrame:
        return pca_batch_search(
            queries, self.table, self.model, k=k, over_fetch=self.over_fetch,
            id_col=self.id_col, vec_col=self.vec_col,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
        )


def build_pca_index(
    df: DataFrame,
    k_components: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    over_fetch: int = 10,
) -> PcaIndex:
    """Fit PCA (one sufficient-stats pass) and hand back the handle —
    the CREATE INDEX analog for the reduce-then-refine rung."""
    model = fit_pca(df, vec_col=vec_col, k=k_components)
    return PcaIndex(df.select(id_col, vec_col), model, id_col=id_col,
                    vec_col=vec_col, over_fetch=over_fetch)
