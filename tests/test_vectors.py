"""Vector kernel (B6) properties: exact values on hand-computed inputs,
invariants on fixture vectors."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark import vectors as V
from vector_search_databricks_poc_spark.catalog import load_table


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [
            Row(id=1, a=[1.0, 2.0, 3.0], b=[4.0, 5.0, 6.0]),
            Row(id=2, a=[1.0, 0.0, 0.0], b=[0.0, 1.0, 0.0]),
            Row(id=3, a=[0.0, 0.0, 0.0], b=[1.0, 1.0, 1.0]),
        ]
    )


def test_dot_exact(toy):
    out = {r["id"]: r["d"] for r in toy.select("id", V.dot("a", "b").alias("d")).collect()}
    assert out == {1: 32.0, 2: 0.0, 3: 0.0}


def test_cosine_orthogonal_and_null_on_zero(toy):
    out = {r["id"]: r["c"] for r in toy.select("id", V.cosine("a", "b").alias("c")).collect()}
    assert out[2] == 0.0
    assert out[3] is None  # zero vector -> NULL, not div-by-zero
    expected = 32.0 / (math.sqrt(14) * math.sqrt(77))
    assert abs(out[1] - expected) < 1e-12


def test_l2_norm_and_distance(toy):
    row = toy.where("id = 1").select(
        V.l2_norm("a").alias("n"), V.l2_distance("a", "b").alias("d")
    ).first()
    assert abs(row["n"] - math.sqrt(14)) < 1e-12
    assert abs(row["d"] - math.sqrt(27)) < 1e-12


def test_normalize_unit_norm_on_fixtures(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    norms = (
        e.select(V.l2_norm(V.l2_normalize("embedding")).alias("n"))
        .agg(F.min("n").alias("lo"), F.max("n").alias("hi"))
        .first()
    )
    assert abs(norms["lo"] - 1.0) < 1e-9 and abs(norms["hi"] - 1.0) < 1e-9


def test_normalize_zero_vector_passthrough(spark):
    df = spark.createDataFrame([Row(a=[0.0, 0.0])])
    assert df.select(V.l2_normalize("a").alias("u")).first()["u"] == [0.0, 0.0]


def test_vec_add_scale(toy):
    row = toy.where("id = 2").select(
        V.vec_add("a", "b").alias("s"), V.vec_scale("a", F.lit(3.0)).alias("m")
    ).first()
    assert row["s"] == [1.0, 1.0, 0.0]
    assert row["m"] == [3.0, 0.0, 0.0]


def test_dim_check(toy):
    n = toy.where(V.vec_dim_ok("a", 3)).count()
    assert n == 3
    assert toy.where(V.vec_dim_ok("a", 4)).count() == 0


def test_masked_mean_pool_golden():
    """Golden-activation contract of the transformer pooling math
    (reference syntetic_data.py:158-163): sum(h*mask,1)/clamp(sum(mask,1),
    1e-9), verified on hand-computed activations — torch isn't installed,
    so this pins the numerics the UDF applies to model output."""
    import numpy as np

    from vector_search_databricks_poc_spark.functions.embedding import masked_mean_pool

    hidden = [
        [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],   # mask drops the 3rd token
        [[10.0, -2.0], [7.0, 7.0], [1.0, 1.0]],  # only the 1st token counts
        [[9.0, 9.0], [9.0, 9.0], [9.0, 9.0]],    # fully masked -> clamp path
    ]
    mask = [[1, 1, 0], [1, 0, 0], [0, 0, 0]]
    got = masked_mean_pool(hidden, mask)
    expected = np.array(
        [
            [2.0, 3.0],      # ([1,2]+[3,4])/2
            [10.0, -2.0],    # first token only
            [0.0, 0.0],      # 0-sum / 1e-9 clamp = 0, no NaN/inf
        ]
    )
    assert np.allclose(got, expected, atol=1e-12)
    assert np.isfinite(got).all()


def test_masked_mean_pool_matches_reference_formula_random():
    """Property check against an independent transcription of the
    reference's torch expression on random activations."""
    import numpy as np

    from vector_search_databricks_poc_spark.functions.embedding import masked_mean_pool

    rng = np.random.default_rng(7)
    h = rng.normal(size=(5, 9, 16))
    m = (rng.random(size=(5, 9)) > 0.4).astype("int64")
    # independent transcription: expand mask, elementwise, clamp
    mexp = np.repeat(m[:, :, None], 16, axis=2).astype("float64")
    want = (h * mexp).sum(axis=1) / np.maximum(mexp.sum(axis=1), 1e-9)
    assert np.allclose(masked_mean_pool(h, m), want, atol=1e-12)
