"""Metadata-filtered vector search: the ``filters=`` knob of the
similarity-search surface.

Reference behavior: the managed Vector Search endpoint's
``similarity_search`` accepts a ``filters`` dict restricting candidates
BEFORE ranking — the same public client call the reference makes
unfiltered (query_endpoint.py:136-150).  This module re-expresses that
dict mini-language as ONE Catalyst predicate (`filter_expr`) and provides
the two physical strategies a distributed engine needs:

- **prefilter** — apply the predicate to the corpus (or semi-join the
  index's probed partitions against the filtered id set) and rank only
  survivors.  Right when the filter is SELECTIVE: the candidate set
  shrinks before any scoring work, and on a brute scan the predicate
  pushes down to the parquet reader (plan-asserted in tests/test_plans.py).
- **postfilter** — rank ``over_fetch``·k unfiltered candidates (cheap on
  an index probe), then filter and trim to k.  Right when the filter is
  PERMISSIVE: the index's pruning does the heavy lifting and the filter
  only trims the short candidate list.  May legitimately return FEWER
  than k rows when the filter kills more candidates than the over-fetch
  allowed — under-fill is reported honestly, never silently topped up.

Filter-dict mini-language (each entry ANDs; ``OR`` inside a key joins
fields):

    {"lang": "en"}                 field = value
    {"lang": ["en", "de"]}         field IN (...)
    {"label NOT": 3}               field <> value   (list -> NOT IN)
    {"n_chars >=": 100}            <, <=, >, >= comparisons
    {"source LIKE": "cc-%"}        SQL LIKE pattern
    {"lang OR source": "web"}      (lang = 'web') OR (source = 'web')

SQL three-valued logic applies: a row whose filtered field is NULL never
matches (same as the DuckDB oracle), including under NOT.

100 TB shape: `filter_expr` is a plain Catalyst predicate, so prefilter
costs zero extra shuffles on a scan (pushdown + pruning) and one
id-semi-join on an index probe (the filtered-id side broadcasts when
selective; AQE picks the join strategy from runtime sizes otherwise);
postfilter touches only the ≤ over_fetch·k candidate rows.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .topk import top_k_similar

_OPS = {"NOT", "<", "<=", ">", ">=", "LIKE"}


def _leaf(field: str, op: str, value) -> Column:
    c = F.col(field)
    is_seq = isinstance(value, (list, tuple, set, frozenset))
    if is_seq:
        # sets get a deterministic order; lists/tuples keep the caller's
        value = sorted(value) if isinstance(value, (set, frozenset)) else list(value)
    if op == "=":
        return c.isin(*value) if is_seq else (c == F.lit(value))
    if op == "NOT":
        return ~c.isin(*value) if is_seq else (c != F.lit(value))
    if op == "LIKE":
        return c.like(str(value))
    if is_seq:
        raise ValueError(f"list value not valid for comparison op {op!r}")
    if op == "<":
        return c < F.lit(value)
    if op == "<=":
        return c <= F.lit(value)
    if op == ">":
        return c > F.lit(value)
    if op == ">=":
        return c >= F.lit(value)
    raise ValueError(f"unknown filter op {op!r}")


def filter_expr(filters: dict) -> Column:
    """The filter dict as one Catalyst predicate (see module head for the
    mini-language).  Empty dict -> TRUE (no filtering)."""
    conjuncts = []
    for key, value in filters.items():
        parts = key.strip().split()
        op = "="
        if parts and parts[-1].upper() in _OPS:
            op = parts[-1].upper()
            parts = parts[:-1]
        fields = [f.strip() for f in " ".join(parts).split(" OR ")]
        if not fields or any(not f for f in fields):
            raise ValueError(f"malformed filter key {key!r}")
        disj = reduce(
            lambda a, b: a | b, [_leaf(f, op, value) for f in fields]
        )
        conjuncts.append(disj)
    if not conjuncts:
        return F.lit(True)
    return reduce(lambda a, b: a & b, conjuncts)


def filtered_top_k(
    corpus: DataFrame,
    query_vector,
    filters: dict,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    score_decimals: int | None = 6,
) -> DataFrame:
    """Brute-scan filtered search: predicate first (pushes down to the
    parquet reader), exact top-k over survivors.  The exact-answer
    baseline every index strategy is compared against."""
    return top_k_similar(
        corpus.where(filter_expr(filters)),
        query_vector,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        metric=metric,
        score_decimals=score_decimals,
    )


def postfilter_hits(
    hits: DataFrame,
    meta: DataFrame,
    filters: dict,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Filter an already-ranked candidate list against metadata and keep
    the top k survivors.  Works on ANY (id, score) hits frame — IVF probe,
    graph beam, hybrid RRF — so every index family gets filtered search
    without re-implementing it.  The hits side is ≤ over_fetch·k rows and
    broadcasts into the metadata semi-join."""
    allowed = meta.where(filter_expr(filters)).select(id_col)
    return (
        hits.join(allowed, id_col, "left_semi")
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def postfilter_batch_hits(
    hits: DataFrame,
    meta: DataFrame,
    filters: dict,
    k: int,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Per-query postfilter for batched hits (IVF/graph ``batch_search``
    output): filter the candidate lists against metadata, then re-rank to
    the top ``k`` survivors WITHIN each query.  Same under-fill honesty as
    ``postfilter_hits``; the window re-numbers ranks so consumers see a
    dense 1..k per query."""
    from pyspark.sql import Window

    allowed = meta.where(filter_expr(filters)).select(id_col)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        hits.join(allowed, id_col, "left_semi")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# Below this filtered fraction of the metadata, prefiltering beats
# over-fetch postfiltering (the candidate list would mostly die); above
# it the unfiltered probe + trim is cheaper.  The 1/over_fetch shape:
# postfilter expects ~selectivity·over_fetch·k survivors, so it fills k
# exactly when selectivity ≈ 1/over_fetch.
def _auto_strategy(meta: DataFrame, filters: dict, over_fetch: int) -> str:
    """Pick prefilter vs postfilter from measured selectivity: one
    count-aggregate over the metadata with the predicate pushed down
    (a planning probe, same class as the IVF centroid fetch — run once
    per query shape, not per row)."""
    agg = meta.agg(
        F.count(F.lit(1)).alias("_n"),
        F.count(F.when(filter_expr(filters), 1)).alias("_match"),
    ).first()
    n, match = agg["_n"], agg["_match"]
    if not n:
        return "prefilter"
    return "prefilter" if (match / n) < (1.0 / over_fetch) else "postfilter"


def ivf_search_filtered(
    spark: SparkSession,
    index,
    query_vector: list[float],
    meta: DataFrame,
    filters: dict,
    k: int = 10,
    nprobe: int = 4,
    strategy: str = "prefilter",
    over_fetch: int = 4,
    meta_id_col: str | None = None,
) -> DataFrame:
    """Filtered probe of an IVF index (`operators/index.py::IvfIndex`).

    ``meta`` holds the filterable columns keyed by ``meta_id_col``
    (default: the index id column) — the index table itself stays
    (id, vec, centroid) and never rewrites when filter schemas evolve.

    - ``strategy="prefilter"``: the filtered id set semi-joins the probed
      partitions BEFORE scoring — exact within the probe, any selectivity.
    - ``strategy="postfilter"``: score the probe unfiltered, keep
      ``over_fetch``·k, then filter — cheaper for permissive filters, may
      under-fill below k (see module head).
    - ``strategy="auto"``: measure the filter's selectivity with one
      pushed-down count over ``meta`` and pick: selective (< 1/over_fetch
      of rows match) → prefilter, permissive → postfilter.  Costs one
      planning aggregate — eager by the same contract as the index's
      centroid math.
    """
    if strategy == "auto":
        strategy = _auto_strategy(meta, filters, over_fetch)
    if strategy not in ("prefilter", "postfilter"):
        raise ValueError(f"strategy must be prefilter|postfilter|auto, got {strategy!r}")
    idc = meta_id_col or index.id_col
    if strategy == "postfilter":
        hits = index.search(spark, query_vector, k=over_fetch * k, nprobe=nprobe)
        # Filter BEFORE projecting/renaming the id: projecting first only
        # worked via Spark's missing-reference resolution through the
        # Project, and when meta_id_col != index.id_col a filter key named
        # index.id_col would silently bind to the RENAMED meta id.
        allowed_ids = meta.where(filter_expr(filters)).select(
            F.col(idc).alias(index.id_col)
        )
        return (
            hits.join(allowed_ids, index.id_col, "left_semi")
            .orderBy(F.desc("score"), F.col(index.id_col))
            .limit(k)
        )
    allowed = meta.where(filter_expr(filters)).select(
        F.col(idc).alias(index.id_col)
    )
    probes = index.nearest_centroids(query_vector, nprobe)
    qn = math.sqrt(sum(x * x for x in query_vector)) or 1.0
    qnorm = [x / qn for x in query_vector]
    survivors = (
        spark.read.parquet(index.path)
        .where(F.col("centroid_id").isin(probes))
        .join(allowed, index.id_col, "left_semi")
    )
    return top_k_similar(
        survivors, qnorm, k=k, id_col=index.id_col, vec_col=index.vec_col,
        metric="cosine",
    )
