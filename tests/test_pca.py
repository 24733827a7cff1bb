"""Distributed PCA: numpy parity for the fit, exactness/recall for search.

The fit runs on sufficient statistics aggregated across partitions; the
reference is numpy PCA on the very same rows collected to the driver —
components (after the shared sign canonicalization), mean, and
eigenvalues must agree to float tolerance regardless of partitioning.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.pca import (
    fit_pca,
    pca_reduced_search,
    project_expr,
)


def _ref_pca(X: np.ndarray, k: int):
    mean = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, mean, vals[order]


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_fit_matches_numpy(spark, emb):
    X = np.array(
        [r[0] for r in emb.select(F.col("embedding").cast("array<double>")).collect()]
    )
    model = fit_pca(emb.repartition(7), k=5)  # odd partitioning on purpose
    comps, mean, vals = _ref_pca(X, 5)
    assert np.allclose(model.mean, mean, atol=1e-9)
    assert np.allclose(model.explained_variance, vals, atol=1e-9)
    assert np.allclose(model.components, comps, atol=1e-7)
    # orthonormality of what we ship
    C = np.array(model.components)
    assert np.allclose(C @ C.T, np.eye(5), atol=1e-9)


def test_projection_expr_matches_numpy(spark, emb):
    model = fit_pca(emb, k=4)
    rows = (
        emb.limit(20)
        .select(
            F.col("vec_id"),
            F.col("embedding").cast("array<double>").alias("v"),
            project_expr(model, "embedding").alias("r"),
        )
        .collect()
    )
    C = np.array(model.components)
    m = np.array(model.mean)
    for r in rows:
        want = C @ (np.array(r["v"]) - m)
        assert np.allclose(r["r"], want, atol=1e-9), r["vec_id"]


def _exact_top(spark, emb, q, k):
    from vector_search_databricks_poc_spark import vectors as V

    return [
        r["vec_id"]
        for r in emb.select(
            "vec_id",
            F.round(
                V.cosine(F.col("embedding").cast("array<double>"), V.lit_vector(q)), 6
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
        .collect()
    ]


@pytest.fixture(scope="module")
def query_vec(emb):
    return emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>")
    ).first()[0]


def test_wide_over_fetch_is_exact(spark, emb, query_vec):
    """over_fetch covering the whole corpus => stage 1 drops nothing and
    the result IS the exact brute-force top-k."""
    n = emb.count()
    model = fit_pca(emb, k=8)
    got = [
        r["vec_id"]
        for r in pca_reduced_search(
            emb, model, query_vec, k=10, over_fetch=(n // 10) + 1
        ).collect()
    ]
    assert got == _exact_top(spark, emb, query_vec, 10)


def test_narrow_over_fetch_recall(spark, emb, query_vec):
    """k=32 of 64 dims: the synthetic embeddings are near-isotropic
    (top-32 eigenvalues ~65% of variance), so half the dims is the honest
    setting here; anisotropic real corpora need far fewer."""
    model = fit_pca(emb, k=32)
    got = set(
        r["vec_id"]
        for r in pca_reduced_search(emb, model, query_vec, k=10, over_fetch=5).collect()
    )
    exact = set(_exact_top(spark, emb, query_vec, 10))
    assert len(got & exact) >= 8, (got, exact)


def test_fit_guards(spark, emb):
    with pytest.raises(ValueError):
        fit_pca(emb.limit(1), k=2)
    with pytest.raises(ValueError):
        fit_pca(emb, k=10_000)


def test_declared_query_runs(spark):
    from vector_search_databricks_poc_spark import queries_registry as R

    out = R.QUERIES["pca_reduced_search"](spark, SF_DIR)
    rows = out.collect()
    assert len(rows) == 10
    assert rows[0]["vec_id"] == 0  # self-match tops the list
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
