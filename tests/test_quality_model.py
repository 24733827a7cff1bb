"""Trained quality classifier tests (operators/quality_model.py):
planted separation, shuffle-free scoring plan, filter semantics, and the
declared held-out query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.quality_model import (
    quality_classifier_filter,
    score_quality,
    train_quality_classifier,
)


def _gibberish(col):
    return F.array_join(
        F.transform(
            F.filter(F.split(col, r"\s+"), lambda t: t != ""),
            lambda t: F.substring(F.hex(F.xxhash64(t)), 1, 8),
        ),
        " ",
    )


def _planted(spark, lo, hi):
    d = load_table(spark, SF_DIR, "documents").where(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )
    ref = d.select("doc_id", "text")
    crawl = d.select("doc_id", _gibberish(F.col("text")).alias("text"))
    return ref, crawl


def test_classifier_separates_planted_classes(spark):
    """Natural fixture text vs token-hash gibberish: a linear TF model
    must separate the held-out split essentially perfectly."""
    ref, crawl = _planted(spark, 0, 150)
    model = train_quality_classifier(ref, crawl, dim=1 << 16)
    href, hcrawl = _planted(spark, 150, 250)
    pr = [r["quality_prob"] for r in score_quality(href, model, dim=1 << 16).collect()]
    pc = [r["quality_prob"] for r in score_quality(hcrawl, model, dim=1 << 16).collect()]
    assert len(pr) == len(pc) > 0
    # full separation: worst reference doc beats best gibberish doc
    assert min(pr) > max(pc)
    assert sum(p >= 0.5 for p in pr) >= 0.95 * len(pr)
    assert sum(p >= 0.5 for p in pc) <= 0.05 * len(pc)


def test_scoring_is_shuffle_free(spark):
    """The 100 TB contract: scoring = one map-side transform, the model
    coefficients broadcast in-plan — NO exchange anywhere."""
    from vector_search_databricks_poc_spark.plans import audit as A

    ref, crawl = _planted(spark, 0, 80)
    model = train_quality_classifier(ref, crawl, dim=1 << 14, max_iter=5)
    scored = score_quality(ref, model, dim=1 << 14)
    assert A.count_exchanges(scored) == 0, A.plan_string(scored)


def test_filter_keeps_reference_like(spark):
    ref, crawl = _planted(spark, 0, 120)
    model = train_quality_classifier(ref, crawl, dim=1 << 16)
    mixed = ref.withColumn("is_ref", F.lit(True)).unionByName(
        crawl.withColumn("is_ref", F.lit(False))
    )
    kept = quality_classifier_filter(mixed, model)
    rows = kept.groupBy("is_ref").count().collect()
    by = {r["is_ref"]: r["count"] for r in rows}
    assert by.get(True, 0) >= 0.95 * 120
    assert by.get(False, 0) <= 0.05 * 120
    assert "quality_prob" not in kept.columns  # filter form drops the score


def test_declared_quality_classifier_query(spark):
    from vector_search_databricks_poc_spark import queries_registry as R

    out = {r["cls"]: r for r in R.QUERIES["quality_classifier"](spark, SF_DIR).collect()}
    assert set(out) == {"crawl", "ref"}
    assert out["ref"]["n_kept"] >= 0.95 * out["ref"]["n_docs"]
    assert out["crawl"]["n_kept"] <= 0.05 * out["crawl"]["n_docs"]


def test_prepare_training_data_with_r6_stages(spark):
    """Composition: the trained classifier, the LM perplexity cut, and
    exact-substring dedup plug into prepare_training_data in the
    published order — planted gibberish and a planted duplicated block
    are both gone from the output, clean docs survive."""
    from vector_search_databricks_poc_spark.operators.lm import train_ngram_lm
    from vector_search_databricks_poc_spark.pipelines import prepare_training_data

    base = load_table(spark, SF_DIR, "documents").where(F.col("doc_id") < 150)
    block = " ".join(f"lic{i}" for i in range(8))
    corpus = base.select(
        "doc_id",
        "lang",
        F.when(F.col("doc_id") % 3 == 0, _gibberish(F.col("text")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.col("text"), F.lit(" " + block)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    ref = base.where(F.col("doc_id") % 3 != 0).select("text")
    crawl = ref.select(_gibberish(F.col("text")).alias("text"))
    qm = train_quality_classifier(ref, crawl, dim=1 << 14, max_iter=10)
    lm = train_ngram_lm(ref, max_vocab=5000, max_bigrams=50_000)

    train, test = prepare_training_data(
        corpus,
        langs=("en", "de", "fr", "es"),
        min_quality=0.0,
        near_dup_threshold=0.95,
        test_fraction=0.2,
        substring_dedup_tokens=8,
        quality_model=qm,
        quality_model_threshold=0.5,
        lm_model=lm,
        lm_max_logppl=20.0,
    )
    out = train.unionByName(test)
    rows = out.collect()
    assert rows, "pipeline dropped everything"
    ids = {r["doc_id"] for r in rows}
    assert not any(i % 3 == 0 for i in ids)  # gibberish class filtered
    assert not any("lic0" in r["text"] for r in rows)  # dup block cut
    assert any(i % 3 == 2 for i in ids)  # clean docs survive
