"""Trained document-quality classifier (the GPT-3 / CCNet / LLaMA step).

Published pretraining pipelines do not stop at heuristic quality scores:
they TRAIN a linear classifier to separate a high-quality reference
corpus (WebText/Wikipedia/books) from raw crawl text, then keep crawl
documents the model scores as reference-like (GPT-3 Appendix A; CCNet's
fasttext language/quality filter; LLaMA reproduces the same recipe).
This module is that step on Spark primitives:

- features: hashed bag-of-words term frequencies (``HashingTF`` — the
  fasttext-style fixed-dim trick: no vocabulary state, any corpus size);
- model: MLlib ``LogisticRegression`` (distributed LBFGS — the fit
  aggregates gradients tree-wise, nothing per-document on the driver);
- scoring: the fitted coefficients fold into a broadcast transform —
  scoring a 100 TB corpus is one map-side pipeline, no shuffle.

Determinism note: LBFGS converges to the same optimum but double
summation order varies with partitioning, so probabilities are stable
only to ~1e-6 — tests assert separation quality (planted AUC, margin),
never exact values, and the declared query emits THRESHOLDED counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import TOKEN_SPLIT_REGEX


def _tokens_col(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_REGEX), lambda t: t != ""
    )


def quality_features(
    df: DataFrame, text_col: str = "text", dim: int = 1 << 18
) -> DataFrame:
    """Hashed-TF feature column ``features`` appended (lowercased
    whitespace tokens -> fixed ``dim`` sparse vector).  Pure map-side."""
    from pyspark.ml.feature import HashingTF

    tokened = df.withColumn("_qtoks", _tokens_col(text_col))
    tf = HashingTF(inputCol="_qtoks", outputCol="features", numFeatures=dim)
    return tf.transform(tokened).drop("_qtoks")


def train_quality_classifier(
    reference: DataFrame,
    crawl: DataFrame,
    text_col: str = "text",
    dim: int = 1 << 18,
    max_iter: int = 30,
    reg_param: float = 1e-4,
):
    """Fit the reference-vs-crawl linear classifier; returns the fitted
    MLlib model (coefficients broadcast at scoring time).  Label 1 =
    reference-like (the keep direction)."""
    from pyspark.ml.classification import LogisticRegression

    pos = reference.select(F.col(text_col).alias("text")).withColumn(
        "label", F.lit(1.0)
    )
    neg = crawl.select(F.col(text_col).alias("text")).withColumn(
        "label", F.lit(0.0)
    )
    data = quality_features(pos.unionByName(neg), "text", dim).select(
        "label", "features"
    )
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param)
    return lr.fit(data)


def score_quality(
    df: DataFrame, model, text_col: str = "text", dim: int | None = None
) -> DataFrame:
    """Append ``quality_prob`` (P(reference-like)) to every row — one
    map-side transform, the model coefficients broadcast in the plan."""
    from pyspark.ml.functions import vector_to_array

    d = dim if dim is not None else model.numFeatures
    feats = quality_features(df, text_col, d)
    scored = model.transform(feats)
    return scored.withColumn(
        "quality_prob", vector_to_array("probability")[1]
    ).drop("features", "rawPrediction", "probability", "prediction")


def quality_classifier_filter(
    df: DataFrame, model, text_col: str = "text", keep_threshold: float = 0.5
) -> DataFrame:
    """The pipeline form: keep rows the classifier scores reference-like.
    GPT-3 instead keeps stochastically with probability ~ score (a Pareto
    lottery) to avoid a hard cliff; a deterministic threshold is the
    reproducible variant — pass the lottery upstream if wanted."""
    return (
        score_quality(df, model, text_col)
        .where(F.col("quality_prob") >= keep_threshold)
        .drop("quality_prob")
    )
