"""Sampling/splitting operators (training-data pipeline)."""

from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.sampling import (
    cap_per_group,
    stratified_sample,
    train_test_split,
)


def test_split_partitions_everything_once(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    train, test = train_test_split(d, "doc_id", test_fraction=0.2)
    n, tr, te = d.count(), train.count(), test.count()
    assert tr + te == n
    assert train.join(test, "doc_id", "inner").count() == 0  # disjoint
    # deterministic: rerun gives identical membership
    train2, _ = train_test_split(d, "doc_id", test_fraction=0.2)
    assert train.select("doc_id").exceptAll(train2.select("doc_id")).count() == 0
    # fraction within tolerance
    assert 0.1 < te / n < 0.3


def test_stratified_sample_fractions(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    fr = {"en": 0.5, "es": 0.1, "fr": 0.1, "de": 0.1, "zh": 1.0}
    s = stratified_sample(d, "lang", fr)
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sampled = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sampled.get("zh", 0) == totals["zh"]  # fraction 1.0 keeps all
    assert sampled.get("en", 0) < totals["en"]
    # seeded determinism
    s2 = stratified_sample(d, "lang", fr)
    assert s.exceptAll(s2).count() == 0


def test_cap_per_group(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    capped = cap_per_group(d, "lang", 10, "doc_id")
    per = capped.groupBy("lang").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 10 for r in per)
    # keeps the lowest ids per group
    first = capped.groupBy("lang").agg(F.min("doc_id").alias("m")).collect()
    orig_first = d.groupBy("lang").agg(F.min("doc_id").alias("m")).collect()
    assert {(r["lang"], r["m"]) for r in first} == {(r["lang"], r["m"]) for r in orig_first}
