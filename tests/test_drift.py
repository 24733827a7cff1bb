"""Distribution drift (operators/drift.py): PSI goldens, null-bin
semantics, degenerate snapshots, and the one-scan plan shape."""

import math

import pytest

from tests.conftest import SF_DIR

from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.operators.drift import (
    binned_histogram,
    profile_drift,
)
from vector_search_databricks_poc_spark.plans.audit import count_exchanges

EPS = 1e-6


def _psi(p_old: list[float], p_new: list[float]) -> float:
    return sum(
        (pn + EPS - (po + EPS)) * math.log((pn + EPS) / (po + EPS))
        for po, pn in zip(p_old, p_new)
    )


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_histogram_bins_clamp_and_null(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (25.0,), (999.0,), (None,)],
        "x double",
    )
    got = {
        (r["bin"]): r["n"]
        for r in binned_histogram(df, {"x": (0.0, 100.0, 10)}).collect()
    }
    # -5 clamps into bin 0; 999 clamps into bin 9; null in bin -1
    assert got[-1] == 1 and got[0] == 3 and got[1] == 1 and got[2] == 1
    assert got[9] == 1
    assert sum(got.values()) == 7 and len(got) == 11  # full grid emitted


def test_psi_golden_hand_computed(spark):
    # old: 4 rows in bin 0, 4 in bin 1; new: 2 in bin 0, 6 in bin 1
    old = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4, 6, 7, 8, 9]], "x double")
    new = spark.createDataFrame([(float(v),) for v in [1, 2, 6, 6, 7, 8, 9, 9]], "x double")
    r = _one(profile_drift(old, new, {"x": (0.0, 10.0, 2)}))
    expected = _psi([0.0, 0.5, 0.5], [0.0, 0.25, 0.75])  # bins: -1, 0, 1
    assert abs(r["psi"] - expected) < 1e-9
    assert r["n_old"] == r["n_new"] == 8
    assert r["max_shift_bin"] in (0, 1) and abs(r["max_shift"] - 0.25) < 1e-9


def test_identical_snapshots_zero_psi(spark, sf_dir):
    from vector_search_databricks_poc_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("n_chars")
    r = _one(profile_drift(docs, docs, {"n_chars": (0.0, 1000.0, 10)}))
    assert r["psi"] == 0.0 and r["max_shift"] == 0.0
    assert r["null_frac_old"] == r["null_frac_new"]


def test_null_rate_shift_lands_in_null_bin(spark):
    old = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    new = spark.createDataFrame(
        [((None if i % 4 == 0 else float(i % 10)),) for i in range(100)], "x double"
    )
    r = _one(profile_drift(old, new, {"x": (0.0, 10.0, 5)}))
    assert r["null_frac_old"] == 0.0 and abs(r["null_frac_new"] - 0.25) < 1e-9
    assert r["max_shift_bin"] == -1 and abs(r["max_shift"] - 0.25) < 1e-9
    assert r["psi"] > 0.1


def test_empty_side_is_finite(spark):
    old = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    new = old.where(F.col("x") > 100)
    r = _one(profile_drift(old, new, {"x": (0.0, 10.0, 4)}))
    assert r["n_new"] == 0 and math.isfinite(r["psi"])


def test_multi_column_one_scan_no_join_explosion(spark, sf_dir):
    from vector_search_databricks_poc_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "n_chars", F.length("text").alias("text_len")
    )
    spec = {"n_chars": (0.0, 1000.0, 10), "text_len": (0.0, 1200.0, 12)}
    out = profile_drift(docs, docs.where(F.col("n_chars") <= 800), spec)
    assert out.count() == 2  # one report row per column
    # each histogram is a global aggregate: the corpus is never shuffled
    # by a key — only single-partition exchanges of one-row partials and
    # the tiny grid join appear
    hist = binned_histogram(docs, spec)
    assert count_exchanges(hist) <= 1  # the single-partition gather only


def test_registry_query_matches_numpy_reference(spark):
    """Full re-derivation of profile_drift_psi with numpy over the same
    parquet (independent binning, PSI, null fracs, max-shift), matching
    the declared query's rounded output exactly."""
    import duckdb
    import numpy as np

    from tests.conftest import SF_DIR
    from vector_search_databricks_poc_spark import queries_registry as R

    got = {
        r["column"]: r
        for r in R.QUERIES["profile_drift_psi"](spark, SF_DIR).collect()
    }

    docs = duckdb.sql(
        f"SELECT doc_id, n_chars, length(text) AS text_len "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()
    new = docs[docs.n_chars <= 800].copy()
    new.loc[new.doc_id % 11 == 0, "n_chars"] = np.nan

    def hist(vals, lo, hi, nb):
        v = np.asarray(vals, dtype=float)
        counts = np.zeros(nb + 1)  # slot 0 = null bin
        counts[0] = np.isnan(v).sum()
        b = np.clip(np.floor((v[~np.isnan(v)] - lo) / ((hi - lo) / nb)), 0, nb - 1)
        for i in range(nb):
            counts[i + 1] = (b == i).sum()
        return counts

    for col, (lo, hi, nb) in {
        "n_chars": (0.0, 1000.0, 10),
        "text_len": (0.0, 1200.0, 12),
    }.items():
        co = hist(docs[col], lo, hi, nb)
        cn = hist(new[col], lo, hi, nb)
        po, pn = co / co.sum(), cn / cn.sum()
        psi = float(np.sum((pn - po) * np.log((pn + EPS) / (po + EPS))))
        r = got[col]
        assert r["n_old"] == co.sum() and r["n_new"] == cn.sum()
        assert abs(r["psi"] - round(psi, 6)) <= 1e-6, (col, r["psi"], psi)
        assert abs(r["null_frac_old"] - po[0]) <= 1e-6
        assert abs(r["null_frac_new"] - pn[0]) <= 1e-6
        shifts = np.abs(pn - po)
        assert abs(r["max_shift"] - round(float(shifts.max()), 6)) <= 1e-6
        best = int(np.lexsort((np.arange(len(shifts)), -shifts))[0]) - 1
        assert r["max_shift_bin"] == best


# ---------------------------------------------------------------------------
# embedding drift (r7)
# ---------------------------------------------------------------------------


def test_embedding_drift_identical_snapshots_zero_psi(spark):
    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.operators.drift import embedding_drift
    from vector_search_databricks_poc_spark.operators.pca import fit_pca

    e = load_table(spark, SF_DIR, "embeddings")
    model = fit_pca(e, k=4)
    rows = embedding_drift(e, e, model).collect()
    assert len(rows) == 4
    for r in rows:
        assert abs(r["psi"]) < 1e-9, r
        assert r["max_shift"] == 0.0


def test_embedding_drift_detects_perturbation_and_matches_numpy(spark):
    """Radial scaling + mixture drop must fire PSI on some component,
    and every reported (psi, max_shift) must equal a numpy re-derivation
    of the same projections, bins, and smoothing."""
    import numpy as np
    from pyspark.sql import functions as F

    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.operators.drift import embedding_drift
    from vector_search_databricks_poc_spark.operators.pca import fit_pca

    e = load_table(spark, SF_DIR, "embeddings")
    k, n_bins, n_sigma, eps = 4, 10, 3.0, 1e-6
    model = fit_pca(e, k=k)
    new = e.where(F.col("label") != 0).select(
        F.when(
            F.col("vec_id") % 3 == 0,
            F.transform(F.col("embedding").cast("array<double>"), lambda x: x * 1.3),
        )
        .otherwise(F.col("embedding").cast("array<double>"))
        .alias("embedding"),
    )
    got = {r["column"]: r for r in embedding_drift(e, new, model).collect()}
    assert any(r["psi"] > 0.01 for r in got.values()), got

    rows = e.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).collect()
    X = np.array([r["v"] for r in rows])
    C = np.array(model.components)
    mu = np.array(model.mean)
    P_old = (X - mu) @ C.T
    keep = [i for i, r in enumerate(rows) if r["label"] != 0]
    Xn = np.array(
        [
            np.array(rows[i]["v"]) * (1.3 if rows[i]["vec_id"] % 3 == 0 else 1.0)
            for i in keep
        ]
    )
    P_new = (Xn - mu) @ C.T

    for i in range(k):
        sigma = max(model.explained_variance[i], 1e-12) ** 0.5
        lo, hi = -n_sigma * sigma, n_sigma * sigma
        width = (hi - lo) / n_bins

        def hist(col):
            b = np.floor((col - lo) / width).astype(int)
            b = np.clip(b, 0, n_bins - 1)
            return np.bincount(b, minlength=n_bins).astype(float)

        h_o, h_n = hist(P_old[:, i]), hist(P_new[:, i])
        p_o = h_o / max(h_o.sum(), 1) + eps
        p_n = h_n / max(h_n.sum(), 1) + eps
        psi = float(((p_n - p_o) * np.log(p_n / p_o)).sum())
        shift = np.abs(h_n / max(h_n.sum(), 1) - h_o / max(h_o.sum(), 1))
        r = got[f"pc{i}"]
        assert r["psi"] == pytest.approx(psi, abs=1e-9), (i, r["psi"], psi)
        assert r["max_shift"] == pytest.approx(float(shift.max()), abs=1e-9)
        assert r["n_old"] == len(X) and r["n_new"] == len(Xn)


def test_embedding_drift_declared_query_runs(spark):
    from vector_search_databricks_poc_spark import queries_registry as R

    rows = R.QUERIES["embedding_drift_psi"](spark, SF_DIR).collect()
    assert [r["column"] for r in rows] == [f"pc{i}" for i in range(8)]
    assert any(r["psi"] > 0.01 for r in rows)


def test_binspec_degenerate_grid_raises(spark):
    """ADVICE r7: lo == hi (width 0 -> x/0 bins) and n_bins <= 0 must
    fail loudly instead of silently misattributing mass."""
    from vector_search_databricks_poc_spark.operators.drift import (
        binned_histogram,
        profile_drift,
    )

    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    with pytest.raises(ValueError, match="strictly below"):
        binned_histogram(df, {"x": (5.0, 5.0, 4)})
    with pytest.raises(ValueError, match="strictly below"):
        binned_histogram(df, {"x": (7.0, 2.0, 4)})
    with pytest.raises(ValueError, match="n_bins"):
        binned_histogram(df, {"x": (0.0, 1.0, 0)})
    with pytest.raises(ValueError, match="empty"):
        binned_histogram(df, {})
    with pytest.raises(ValueError, match="n_bins"):
        profile_drift(df, df, {"x": (0.0, 1.0, -3)})
