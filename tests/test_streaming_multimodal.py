"""Streaming/batch equivalence (B20), multimodal plumbing (B13/B22),
approx-distinct error bound (B15)."""

import pytest
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.queries_registry import QUERIES
from vector_search_databricks_poc_spark.streaming.windows import (
    session_windows_batch,
    tumbling_counts,
)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    """The watermarked streaming aggregate over a full replay equals the
    batch aggregate (no late data in a replay -> nothing dropped)."""
    batch = tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour").select(
        "win_start", "event_type", "n_events"
    )
    stream_out = QUERIES["streaming_tumbling"](spark, sf_dir).select(
        "win_start", "event_type", "n_events"
    )
    assert batch.exceptAll(stream_out).count() == 0
    assert stream_out.exceptAll(batch).count() == 0


def test_streaming_dedup_bounds(spark, sf_dir):
    out = QUERIES["streaming_dedup"](spark, sf_dir)
    total = load_table(spark, sf_dir, "events").count()
    distinct_keys = (
        load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct().count()
    )
    n = out.count()
    assert distinct_keys <= n <= total


def test_session_windows_batch_properties(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sess = session_windows_batch(ev, gap_minutes=30).cache()
    # every event accounted for
    assert sess.agg(F.sum("n_events")).first()[0] == ev.count()
    # session bounds ordered
    assert sess.where(F.col("session_end") < F.col("session_start")).count() == 0
    # no two sessions of one user overlap-with-gap: starts are > prev end + gap
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_seq")
    gaps = sess.select(
        "user_id",
        (F.col("session_start").cast("long") - F.lag(F.col("session_end").cast("long")).over(w)).alias("gap"),
    ).where(F.col("gap").isNotNull())
    assert gaps.where(F.col("gap") <= 30 * 60).count() == 0


def test_multimodal_pack_and_features(spark, sf_dir):
    from vector_search_databricks_poc_spark.functions.multimodal import (
        extract_features,
        fake_feature,
        pack_multimodal,
    )

    d = load_table(spark, sf_dir, "documents").limit(20)
    e = load_table(spark, sf_dir, "embeddings")
    media = pack_multimodal(d, e)
    row = media.first()
    assert set(media.columns) == {"asset_id", "doc", "embedding", "payload", "meta"}
    assert bytes(row["payload"]).decode("utf-8") == row["doc"]["text"]
    feats = extract_features(media.withColumn("modality", F.lit("image")), dim=8)
    frow = feats.where(F.col("asset_id") == row["asset_id"]).first()
    assert frow["n_bytes"] == len(bytes(row["payload"]))
    assert frow["feature"] == pytest.approx(fake_feature(bytes(row["payload"]), 8), abs=1e-4)


def test_decode_stub_raises():
    from vector_search_databricks_poc_spark.functions.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"xx")


def test_approx_distinct_error(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    exact = o.select("o_custkey").distinct().count()
    approx = o.agg(F.approx_count_distinct("o_custkey", 0.02).alias("a")).first()["a"]
    assert abs(approx - exact) / exact < 0.1


def test_transformer_udf_is_lazy_without_deps(spark):
    """The pandas_udf builds fine without torch/transformers; only execution
    requires them (import-try gating, B5)."""
    from vector_search_databricks_poc_spark.functions.embedding import (
        make_transformer_encoder_udf,
    )

    udf = make_transformer_encoder_udf()
    df = spark.createDataFrame([("hello",)], ["text"]).withColumn("emb", udf(F.col("text")))
    assert dict(df.dtypes)["emb"] == "array<float>"
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401

        has_deps = True
    except ImportError:
        has_deps = False
    if not has_deps:
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PythonException

        with pytest.raises((PythonException, Py4JJavaError)):
            df.collect()
