"""Metadata-filtered vector search: mini-language unit semantics, DuckDB
value compare for the declared query, index pre/post-filter strategy
equivalence, and under-fill honesty.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection
from vector_search_databricks_poc_spark import queries_registry as R
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.filters import (
    filter_expr,
    filtered_top_k,
    ivf_search_filtered,
    postfilter_hits,
)

@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# mini-language semantics (each case checked against a hand-built predicate)
# ---------------------------------------------------------------------------


def _ids(df, expr):
    return sorted(r["doc_id"] for r in df.where(expr).select("doc_id").collect())


def test_filter_expr_equality_and_in(spark, docs):
    d = docs.limit(200).cache()
    assert _ids(d, filter_expr({"lang": "en"})) == _ids(d, F.col("lang") == "en")
    assert _ids(d, filter_expr({"lang": ["en", "de"]})) == _ids(
        d, F.col("lang").isin("en", "de")
    )
    d.unpersist()


def test_filter_expr_not_comparisons_like_or(spark, docs):
    d = docs.limit(200).cache()
    assert _ids(d, filter_expr({"lang NOT": "en"})) == _ids(d, F.col("lang") != "en")
    assert _ids(d, filter_expr({"lang NOT": ["en", "de"]})) == _ids(
        d, ~F.col("lang").isin("en", "de")
    )
    assert _ids(d, filter_expr({"n_chars >=": 100, "n_chars <": 500})) == _ids(
        d, (F.col("n_chars") >= 100) & (F.col("n_chars") < 500)
    )
    assert _ids(d, filter_expr({"text LIKE": "%the%"})) == _ids(
        d, F.col("text").like("%the%")
    )
    assert _ids(d, filter_expr({"lang OR source": "en"})) == _ids(
        d, (F.col("lang") == "en") | (F.col("source") == "en")
    )
    d.unpersist()


def test_filter_expr_null_semantics(spark):
    """SQL three-valued logic: NULL fields never match — including NOT."""
    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "de")], "id long, lang string"
    )
    assert [r["id"] for r in df.where(filter_expr({"lang": "en"})).collect()] == [1]
    assert [r["id"] for r in df.where(filter_expr({"lang NOT": "en"})).collect()] == [3]


def test_filter_expr_rejects_malformed(spark):
    with pytest.raises(ValueError, match="malformed"):
        filter_expr({" NOT": 1})
    with pytest.raises(ValueError, match="list value"):
        filter_expr({"n_chars <": [1, 2]})
    assert filter_expr({}) is not None  # empty -> TRUE


# ---------------------------------------------------------------------------
# declared query vs DuckDB (closing the rows-only gap at registry level)
# ---------------------------------------------------------------------------


def test_filtered_vector_search_matches_duckdb(spark):
    # the SQL moved into the registry when filtered_vector_search was
    # promoted into the driver's oracle window (r9); the pytest compare
    # stays as the fast local loop
    out = R.QUERIES["filtered_vector_search"](spark, SF_DIR)
    r = compare(
        out, duck_connection(SF_DIR), R.ORACLE_SQL["filtered_vector_search"]
    )
    assert r["values_match"], r


# ---------------------------------------------------------------------------
# index strategies: prefilter ≡ brute at full probe; postfilter semantics
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ivf(spark, emb, tmp_path_factory):
    from vector_search_databricks_poc_spark.operators.index import build_ivf_index

    path = str(tmp_path_factory.mktemp("filt") / "ivf")
    return build_ivf_index(emb, path, k_centroids=4)


def _qv(emb, vid):
    return emb.where(F.col("vec_id") == vid).first()["embedding"]


def test_ivf_prefilter_full_probe_equals_brute(spark, emb, ivf):
    filters = {"label": [0, 1, 2], "vec_id >=": 10}
    q = _qv(emb, 0)
    brute = [tuple(r) for r in filtered_top_k(emb, q, filters, k=10).collect()]
    pre = [
        tuple(r)
        for r in ivf_search_filtered(
            spark, ivf, q, emb, filters, k=10, nprobe=4, strategy="prefilter"
        ).collect()
    ]
    assert pre == brute


def test_ivf_postfilter_full_probe_with_deep_fetch_equals_brute(spark, emb, ivf):
    """With the over-fetch covering the whole filtered corpus, postfilter
    must converge to the exact answer too."""
    filters = {"label NOT": 0}
    q = _qv(emb, 7)
    n = emb.count()
    brute = [tuple(r) for r in filtered_top_k(emb, q, filters, k=10).collect()]
    post = [
        tuple(r)
        for r in ivf_search_filtered(
            spark, ivf, q, emb, filters, k=10, nprobe=4,
            strategy="postfilter", over_fetch=(n // 10) + 1,
        ).collect()
    ]
    assert post == brute


def test_postfilter_underfill_is_honest(spark, emb, ivf):
    """A selective filter that kills most of the shallow candidate list
    must return FEWER than k rows — never silently top up with rows the
    caller's filter semantics would have excluded."""
    q = _qv(emb, 0)
    hits = ivf.search(spark, q, k=20, nprobe=4)
    keep = [r["vec_id"] for r in hits.orderBy(F.desc("score"), "vec_id").collect()][:3]
    got = postfilter_hits(hits, emb, {"vec_id": keep}, k=10).collect()
    assert len(got) == 3
    assert sorted(r["vec_id"] for r in got) == sorted(keep)


def test_ivf_search_filtered_rejects_bad_strategy(spark, emb, ivf):
    with pytest.raises(ValueError, match="strategy"):
        ivf_search_filtered(
            spark, ivf, _qv(emb, 0), emb, {}, strategy="sideways"
        )


def test_auto_strategy_picks_by_selectivity(spark, emb, ivf):
    from vector_search_databricks_poc_spark.operators.filters import _auto_strategy

    n = emb.count()
    # selective: only a handful of ids match -> prefilter
    assert _auto_strategy(emb, {"vec_id <": 5}, over_fetch=4) == "prefilter"
    # permissive: nearly everything matches -> postfilter
    assert _auto_strategy(emb, {"vec_id >=": 0}, over_fetch=4) == "postfilter"
    # auto end-to-end returns the same rows as the strategy it picks
    q = _qv(emb, 0)
    auto = [
        tuple(r)
        for r in ivf_search_filtered(
            spark, ivf, q, emb, {"vec_id <": 5}, k=3, nprobe=4, strategy="auto"
        ).collect()
    ]
    pre = [
        tuple(r)
        for r in ivf_search_filtered(
            spark, ivf, q, emb, {"vec_id <": 5}, k=3, nprobe=4, strategy="prefilter"
        ).collect()
    ]
    assert auto == pre


def test_postfilter_batch_hits_per_query(spark, emb, ivf):
    """Batched postfilter trims each query's list independently and
    re-numbers ranks densely."""
    from vector_search_databricks_poc_spark.operators.filters import (
        postfilter_batch_hits,
    )

    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = ivf.batch_search(spark, queries, k=30, nprobe=4)
    got = postfilter_batch_hits(hits, emb, {"label NOT": 0}, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    assert set(by_q) == {0, 1, 2}
    for qid, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))  # dense 1..k
        assert len(rows) <= 5
        assert all(labels[r["vec_id"]] != 0 for r in rows)
        # survivors are the TOP-scoring survivors of the original list
        orig = sorted(
            (r["score"], r["vec_id"])
            for r in hits.where(F.col("query_id") == qid).collect()
            if labels[r["vec_id"]] != 0
        )[::-1][: len(rows)]
        kept = sorted(((r["score"], r["vec_id"]) for r in rows))[::-1]
        assert kept == orig


def test_postfilter_meta_id_rename_binds_filters_to_meta_columns(spark, emb, ivf):
    """meta_id_col != index.id_col with a filter key that collides with
    index.id_col: the predicate must bind to META's own column, not the
    renamed id (r6 ADVICE — the old code projected the id first and
    resolved the filter through the Project)."""
    n = emb.count()
    q = _qv(emb, 0)
    # meta keyed by doc_id; its OWN vec_id column is the parity flag
    meta = emb.select(
        F.col("vec_id").alias("doc_id"),
        (F.col("vec_id") % 2).alias("vec_id"),
        "label",
    )
    hits = ivf_search_filtered(
        spark, ivf, q, meta, {"vec_id": 1}, k=10, nprobe=4,
        strategy="postfilter", over_fetch=(n // 10) + 1,
        meta_id_col="doc_id",
    ).collect()
    got = [r["vec_id"] for r in hits]
    assert len(got) == 10
    assert all(v % 2 == 1 for v in got)  # odd doc ids only
    # exact answer over the odd half for the same deep fetch
    expect = [
        r["vec_id"]
        for r in filtered_top_k(
            emb.where(F.col("vec_id") % 2 == 1), q, {}, k=10
        ).collect()
    ]
    assert got == expect
