"""similarity_search facade: text≡vector modes, index-kind dispatch
(brute / IVF / IVF-PQ / graph), filters, response shape, error contract.
"""

import pytest
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.functions.embedding import embed_text
from vector_search_databricks_poc_spark.operators.serving import (
    similarity_search,
    to_response,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)


@pytest.fixture(scope="module")
def vecs(spark, docs):
    """Corpus embedded with the same encoder the facade uses for query
    text — id column named vec_id like the index family expects."""
    return embed_text(docs, dim=32).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    ).localCheckpoint()


def test_text_and_vector_modes_agree(spark, docs, vecs):
    """query_text embeds through the SAME encoder as the corpus, so
    searching by a document's text must equal searching by its stored
    vector — the reference's two call modes (query_endpoint.py:126-147)."""
    target = docs.where(F.col("doc_id") == 42).first()
    by_text = similarity_search(
        spark, vecs, docs, "text", query_text=target["text"],
        num_results=5, dim=32,
    ).collect()
    qv = [r for r in vecs.where(F.col("vec_id") == 42).collect()][0]["embedding"]
    by_vec = similarity_search(
        spark, vecs, docs, "text", query_vector=list(qv),
        num_results=5, dim=32,
    ).collect()
    assert [tuple(r) for r in by_text] == [tuple(r) for r in by_vec]
    assert by_text[0]["vec_id"] == 42  # self-hit first
    assert by_text[0]["text"] == target["text"]


def test_index_kinds_converge_at_full_probe(spark, docs, vecs, tmp_path):
    """Brute, IVF (full probe), IVF-PQ (full probe + exact rerank), and a
    wide-beam graph all return the same top-3 ids for the same query."""
    from vector_search_databricks_poc_spark.operators.graph_ann import (
        build_graph_index,
    )
    from vector_search_databricks_poc_spark.operators.index import (
        build_ivf_index,
        build_ivf_pq_index,
    )

    q = docs.where(F.col("doc_id") == 7).first()["text"]
    kw = dict(query_text=q, num_results=3, dim=32)
    brute = similarity_search(spark, vecs, docs, "text", **kw).collect()
    ivf = build_ivf_index(vecs, str(tmp_path / "ivf"), k_centroids=4)
    got_ivf = similarity_search(spark, ivf, docs, "text", nprobe=4, **kw).collect()
    pq = build_ivf_pq_index(vecs, str(tmp_path / "pq"), k_centroids=4, pq_m=4)
    got_pq = similarity_search(
        spark, pq, docs, "text", nprobe=4, source=vecs, **kw
    ).collect()
    g = build_graph_index(vecs, str(tmp_path / "g"), deg=8, k_centroids=4)
    got_g = similarity_search(spark, g, docs, "text", nprobe=4, **kw).collect()

    ids = lambda rows: [r["vec_id"] for r in rows]  # noqa: E731
    assert ids(got_ivf) == ids(brute)
    assert ids(got_pq) == ids(brute)
    assert ids(got_g) == ids(brute)


def test_filters_trim_results(spark, docs, vecs):
    q = docs.where(F.col("doc_id") == 7).first()["text"]
    unfiltered = similarity_search(
        spark, vecs, docs, ["text", "lang"], query_text=q, num_results=10, dim=32
    ).collect()
    langs = {r["lang"] for r in unfiltered}
    assert len(langs) > 1 or langs  # fixture sanity
    pick = sorted(langs)[0]
    filtered = similarity_search(
        spark, vecs, docs, ["text", "lang"], query_text=q, num_results=10,
        dim=32, filters={"lang": pick},
    ).collect()
    assert filtered and all(r["lang"] == pick for r in filtered)
    # filtered results are the top survivors of the same ranking
    surv = [r["vec_id"] for r in unfiltered if r["lang"] == pick]
    assert [r["vec_id"] for r in filtered][: len(surv)] == surv


def test_response_shape(spark, docs, vecs):
    df = similarity_search(
        spark, vecs, docs, "text",
        query_text=docs.first()["text"], num_results=2, dim=32,
    )
    resp = to_response(df)
    assert resp["manifest"]["column_count"] == 3
    assert [c["name"] for c in resp["manifest"]["columns"]] == [
        "vec_id", "text", "score",
    ]
    assert resp["result"]["row_count"] == 2
    assert len(resp["result"]["data_array"]) == 2
    assert all(len(row) == 3 for row in resp["result"]["data_array"])


def test_query_mode_contract(spark, docs, vecs):
    with pytest.raises(ValueError, match="exactly one"):
        similarity_search(spark, vecs, docs, "text", num_results=2)
    with pytest.raises(ValueError, match="exactly one"):
        similarity_search(
            spark, vecs, docs, "text", query_text="x", query_vector=[1.0],
        )
    with pytest.raises(ValueError, match="unsupported index kind"):
        similarity_search(spark, object(), docs, "text", query_text="x")
    from vector_search_databricks_poc_spark.operators.index import IvfPqIndex

    with pytest.raises(ValueError, match="source"):
        similarity_search(
            spark,
            IvfPqIndex("/nope", [[0.0] * 64], None),
            docs,
            "text",
            query_text="x",
        )
    # query_text at a dim that doesn't match the index's centroids must
    # fail up front, not deep inside zip_with (r6 ADVICE)
    with pytest.raises(ValueError, match="centroid"):
        similarity_search(
            spark,
            IvfPqIndex("/nope", [[0.0] * 32], None),
            docs,
            "text",
            query_text="x",
        )


def test_hybrid_query_type_fuses_lexical_and_vector(spark, docs, vecs):
    """query_type='hybrid': RRF of BM25 + vector legs through the facade
    equals the hybrid operator called directly, and a lexical-only match
    (term present, vector dissimilar) can only surface in hybrid mode."""
    from vector_search_databricks_poc_spark.operators.hybrid import hybrid_search

    target = docs.where(F.col("doc_id") == 7).first()["text"]
    got = similarity_search(
        spark, vecs, docs, "text", query_text=target, num_results=5,
        dim=32, query_type="hybrid",
    ).collect()
    terms = [t for t in target.lower().split() if t]
    qv = [
        float(x)
        for x in embed_text(
            spark.createDataFrame([(target,)], "text string"), dim=32
        ).first()["embedding"]
    ]
    direct = hybrid_search(
        docs.select(F.col("doc_id").alias("vec_id"), "text"),
        vecs, terms, qv, k=5, id_col="vec_id", vec_id_col="vec_id",
    ).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in direct]
    assert [r["score"] for r in got] == [r["rrf"] for r in direct]
    assert got[0]["vec_id"] == 7  # self-hit tops both legs


def test_hybrid_contract_errors(spark, docs, vecs):
    with pytest.raises(ValueError, match="query_type"):
        similarity_search(
            spark, vecs, docs, "text", query_text="x", query_type="sideways"
        )
    with pytest.raises(ValueError, match="hybrid needs query_text|needs query_text"):
        similarity_search(
            spark, vecs, docs, "text", query_vector=[0.0] * 32,
            query_type="hybrid", dim=32,
        )


def test_brute_filters_prefilter_fills_k(spark, docs, vecs):
    """Brute DataFrame corpus + filters must dispatch to an exact
    prefiltered scan: a selective filter that would gut the over-fetch
    candidate list still fills k, and the answer equals exact top-k over
    the filtered corpus (r6 ADVICE — the old over-fetch+postfilter path
    could under-fill)."""
    from vector_search_databricks_poc_spark.operators.topk import top_k_similar

    target = docs.where(F.col("doc_id") == 42).first()
    # only every 17th doc survives — over_fetch*k unfiltered candidates
    # would mostly die
    filters = {"doc_id >=": 100}
    allowed_vecs = vecs.join(
        docs.where(F.col("doc_id") >= 100).select(
            F.col("doc_id").alias("vec_id")
        ),
        "vec_id",
        "left_semi",
    )
    qv = [float(x) for x in vecs.where(F.col("vec_id") == 42).first()["embedding"]]
    expect = [
        r["vec_id"]
        for r in top_k_similar(allowed_vecs, qv, k=10, id_col="vec_id").collect()
    ]
    got = similarity_search(
        spark, vecs, docs, "text", query_vector=qv,
        num_results=10, filters=filters, dim=32, over_fetch=1,
    ).collect()
    assert len(got) == 10  # fills k even at over_fetch=1
    assert [r["vec_id"] for r in got] == expect
    assert all(r["vec_id"] >= 100 for r in got)


# ---------------------------------------------------------------------------
# similarity_search_batch: the batch shape of the facade
# ---------------------------------------------------------------------------


def _qdf(spark, docs, ids):
    texts = {r["doc_id"]: r["text"] for r in docs.where(F.col("doc_id").isin(ids)).collect()}
    return spark.createDataFrame(
        [(i, texts[i]) for i in ids], "query_id long, query_text string"
    )


def test_batch_facade_equals_single_per_kind(spark, docs, vecs, tmp_path):
    """For every index kind, the batch facade's per-query slice equals the
    single-query facade called with the same text."""
    from vector_search_databricks_poc_spark.operators.graph_ann import (
        build_graph_index,
    )
    from vector_search_databricks_poc_spark.operators.index import (
        build_ivf_index,
        build_ivf_pq_index,
    )
    from vector_search_databricks_poc_spark.operators.serving import (
        similarity_search_batch,
    )

    qids = [3, 7, 42]
    qdf = _qdf(spark, docs, qids)
    ivf = build_ivf_index(vecs, str(tmp_path / "bivf"), k_centroids=4)
    pq = build_ivf_pq_index(vecs, str(tmp_path / "bpq"), k_centroids=4, pq_m=4)
    g = build_graph_index(vecs, str(tmp_path / "bg"), deg=8, k_centroids=4)

    kinds = [
        ("brute", vecs, {}),
        ("ivf", ivf, {"nprobe": 4}),
        ("pq", pq, {"nprobe": 4, "source": vecs}),
        ("graph", g, {"nprobe": 4}),
    ]
    for name, idx, kw in kinds:
        batch = similarity_search_batch(
            spark, idx, docs, "text", qdf, num_results=5, dim=32, **kw
        ).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid in qids:
            target = docs.where(F.col("doc_id") == qid).first()["text"]
            single = similarity_search(
                spark, idx, docs, "text", query_text=target, num_results=5,
                dim=32, **kw,
            ).collect()
            got = sorted((r["vec_id"], r["score"]) for r in by_q[qid])
            want = sorted((r["vec_id"], r["score"]) for r in single)
            assert got == want, (name, qid)
            assert [r["rank"] for r in sorted(by_q[qid], key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]


def test_batch_facade_filters(spark, docs, vecs, tmp_path):
    """Brute + filters prefilters exactly (fills k); IVF + filters
    postfilters per query (every row passes the predicate)."""
    from vector_search_databricks_poc_spark.operators.index import build_ivf_index
    from vector_search_databricks_poc_spark.operators.serving import (
        similarity_search_batch,
    )
    from vector_search_databricks_poc_spark.operators.topk import top_k_similar

    qids = [3, 42]
    qdf = _qdf(spark, docs, qids)
    filters = {"doc_id >=": 100}
    out = similarity_search_batch(
        spark, vecs, docs, "text", qdf, num_results=8, dim=32,
        filters=filters, over_fetch=1,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    allowed = vecs.join(
        docs.where(F.col("doc_id") >= 100).select(F.col("doc_id").alias("vec_id")),
        "vec_id", "left_semi",
    )
    for qid in qids:
        assert len(by_q[qid]) == 8  # prefilter fills k even at over_fetch=1
        assert all(r["vec_id"] >= 100 for r in by_q[qid])
        from vector_search_databricks_poc_spark.functions.embedding import (
            embed_text as _embed,
        )

        qv = [float(x) for x in vecs.where(F.col("vec_id") == qid).first()["embedding"]]
        want = [r["vec_id"] for r in top_k_similar(allowed, qv, k=8, id_col="vec_id").collect()]
        assert [r["vec_id"] for r in sorted(by_q[qid], key=lambda r: r["rank"])] == want

    ivf = build_ivf_index(vecs, str(tmp_path / "fivf"), k_centroids=4)
    out2 = similarity_search_batch(
        spark, ivf, docs, ["text", "lang"], qdf, num_results=5, dim=32,
        filters={"lang": "en"}, nprobe=4,
    ).collect()
    assert out2 and all(r["lang"] == "en" for r in out2)


def test_batch_facade_contract_and_response(spark, docs, vecs):
    import pytest as _pytest

    from vector_search_databricks_poc_spark.operators.serving import (
        similarity_search_batch,
        to_response_batch,
    )

    qdf = _qdf(spark, docs, [3, 7])
    with _pytest.raises(ValueError, match="exactly one"):
        similarity_search_batch(
            spark, vecs, docs, "text",
            spark.createDataFrame([(1,)], "query_id long"), dim=32,
        )
    with _pytest.raises(ValueError, match="unsupported index kind"):
        similarity_search_batch(spark, object(), docs, "text", qdf, dim=32)
    df = similarity_search_batch(
        spark, vecs, docs, "text", qdf, num_results=2, dim=32
    )
    resp = to_response_batch(df)
    assert set(resp) == {3, 7}
    for qid, r in resp.items():
        assert [c["name"] for c in r["manifest"]["columns"]] == [
            "vec_id", "text", "score",
        ]
        assert r["result"]["row_count"] == 2
        assert all(len(row) == 3 for row in r["result"]["data_array"])


def test_compressed_rungs_converge_at_wide_over_fetch(spark, docs, vecs):
    """Binary-quant and PCA handles through the facade: at over_fetch
    covering the corpus, stage 1 drops nothing, so both equal brute."""
    from vector_search_databricks_poc_spark.operators.binary_quant import (
        build_binary_index,
    )
    from vector_search_databricks_poc_spark.operators.pca import build_pca_index

    q = docs.where(F.col("doc_id") == 7).first()["text"]
    kw = dict(query_text=q, num_results=3, dim=32)
    brute = similarity_search(spark, vecs, docs, "text", **kw).collect()
    n = vecs.count()
    bidx = build_binary_index(vecs, over_fetch=n)
    got_b = similarity_search(spark, bidx, docs, "text", **kw).collect()
    pidx = build_pca_index(vecs, k_components=16, over_fetch=n)
    got_p = similarity_search(spark, pidx, docs, "text", **kw).collect()
    ids = lambda rows: [r["vec_id"] for r in rows]  # noqa: E731
    assert ids(got_b) == ids(brute)
    assert ids(got_p) == ids(brute)


def test_compressed_rungs_batch_equals_single(spark, docs, vecs):
    """batch_search == per-query single search for both handles."""
    from vector_search_databricks_poc_spark.operators.binary_quant import (
        build_binary_index,
    )
    from vector_search_databricks_poc_spark.operators.pca import build_pca_index
    from vector_search_databricks_poc_spark.operators.serving import (
        similarity_search_batch,
    )

    qvs = [
        (i, list(r["embedding"]))
        for i, r in enumerate(
            vecs.where(F.col("vec_id").isin(3, 17, 42)).orderBy("vec_id").collect()
        )
    ]
    queries = spark.createDataFrame(qvs, "query_id long, query_vec array<double>")
    for build in (
        lambda: build_binary_index(vecs, over_fetch=10),
        lambda: build_pca_index(vecs, k_components=16, over_fetch=10),
    ):
        idx = build()
        batch = similarity_search_batch(
            spark, idx, docs, "text", queries, num_results=3, dim=32
        ).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["score"]))
        for qid, qv in qvs:
            single = idx.search(qv, k=3).collect()
            assert by_q[qid] == [(r["vec_id"], r["score"]) for r in single], (
                type(idx).__name__,
                qid,
            )


def test_compressed_rungs_dim_validation(spark, docs, vecs):
    from vector_search_databricks_poc_spark.operators.binary_quant import (
        build_binary_index,
    )

    idx = build_binary_index(vecs)
    with pytest.raises(ValueError, match="does not match the index dimension"):
        similarity_search(
            spark, idx, docs, "text", query_text="anything", num_results=3, dim=16
        )


def test_maxsim_query_type(spark, docs):
    """query_type='maxsim' (r8): the facade's late-interaction mode ==
    the multivec operator composed by hand, filters act as an exact
    prefilter, and the contract errors are loud."""
    from vector_search_databricks_poc_spark.operators.multivec import (
        maxsim_topk,
        multi_vector_expr,
        py_multi_vector,
    )

    corpus = docs.select(
        F.col("doc_id").alias("vec_id"),
        multi_vector_expr("text", dim=16, max_tokens=32, portable=True).alias(
            "token_vecs"
        ),
    ).localCheckpoint()
    qt = "fast hash join query over the part table"

    got = similarity_search(
        spark, corpus, docs, ["lang", "source"],
        query_text=qt, num_results=5, dim=16, query_type="maxsim",
    ).collect()
    want_hits = maxsim_topk(
        corpus, py_multi_vector(qt, dim=16, max_tokens=32), k=5, id_col="vec_id"
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in want_hits
    ]
    assert set(got[0].asDict()) == {"vec_id", "lang", "source", "score"}

    # filters = exact prefilter: every hit satisfies the predicate and
    # k still fills whenever k matches exist
    filt = similarity_search(
        spark, corpus, docs, ["lang"],
        query_text=qt, num_results=5, dim=16, query_type="maxsim",
        filters={"lang": "en"},
    ).collect()
    assert len(filt) == 5 and all(r["lang"] == "en" for r in filt)

    # pruned path plugs in via maxsim_m; wide m == exact
    pruned = similarity_search(
        spark, corpus, docs, ["lang"],
        query_text=qt, num_results=5, dim=16, query_type="maxsim",
        maxsim_m=10**6,
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in pruned] == [
        (r["vec_id"], r["score"]) for r in want_hits
    ]

    with pytest.raises(ValueError, match="needs query_text"):
        similarity_search(
            spark, corpus, docs, ["lang"],
            query_vector=[0.0] * 16, num_results=5, query_type="maxsim",
        )
    with pytest.raises(ValueError, match="token-vector corpus"):
        similarity_search(
            spark, docs, docs, ["lang"],
            query_text=qt, num_results=5, query_type="maxsim",
        )


def test_maxsim_token_index_mode(spark, docs, tmp_path):
    """maxsim_token_index (r9): stage 1 through the IVF token index from
    inside the facade — full probe + wide m == the exact facade result;
    requires maxsim_m."""
    from vector_search_databricks_poc_spark.operators.multivec import (
        build_token_index,
        multi_vector_expr,
    )

    corpus = docs.select(
        F.col("doc_id").alias("vec_id"),
        multi_vector_expr("text", dim=16, max_tokens=32, portable=True).alias(
            "token_vecs"
        ),
    ).localCheckpoint()
    tok_idx = build_token_index(
        corpus, str(tmp_path / "tok_ivf"), id_col="vec_id", k_centroids=4
    )
    qt = "fast hash join query over the part table"
    exact = similarity_search(
        spark, corpus, docs, ["lang"],
        query_text=qt, num_results=5, dim=16, query_type="maxsim",
    ).collect()
    indexed = similarity_search(
        spark, corpus, docs, ["lang"],
        query_text=qt, num_results=5, dim=16, query_type="maxsim",
        maxsim_m=10**6, nprobe=4, maxsim_token_index=tok_idx,
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in indexed] == [
        (r["vec_id"], r["score"]) for r in exact
    ]
    with pytest.raises(ValueError, match="requires maxsim_m"):
        similarity_search(
            spark, corpus, docs, ["lang"],
            query_text=qt, num_results=5, dim=16, query_type="maxsim",
            maxsim_token_index=tok_idx,
        )


def test_batch_maxsim_query_type(spark, docs):
    """Batch query_type='maxsim' (r9): N query texts token-encoded
    in-plan and MaxSim-scored through one broadcast cross join — each
    query's rows equal the single-query maxsim facade; filters apply as
    the exact prefilter."""
    from vector_search_databricks_poc_spark.operators.multivec import (
        multi_vector_expr,
    )
    from vector_search_databricks_poc_spark.operators.serving import (
        similarity_search_batch,
    )

    corpus = docs.select(
        F.col("doc_id").alias("vec_id"),
        multi_vector_expr("text", dim=16, max_tokens=32, portable=True).alias(
            "token_vecs"
        ),
    ).localCheckpoint()
    texts = {
        0: "fast hash join query over the part table",
        1: "customer order priority",
    }
    queries = spark.createDataFrame(
        list(texts.items()), "query_id int, query_text string"
    )
    got = similarity_search_batch(
        spark, corpus, docs, ["lang"], queries,
        num_results=5, dim=16, query_type="maxsim",
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, text in texts.items():
        single = similarity_search(
            spark, corpus, docs, ["lang"],
            query_text=text, num_results=5, dim=16, query_type="maxsim",
        ).collect()
        rows = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [(r["vec_id"], r["score"]) for r in rows] == [
            (r["vec_id"], r["score"]) for r in single
        ], qid

    filt = similarity_search_batch(
        spark, corpus, docs, ["lang"], queries,
        num_results=5, dim=16, query_type="maxsim", filters={"lang": "en"},
    ).collect()
    assert len(filt) == 10 and all(r["lang"] == "en" for r in filt)

    with pytest.raises(ValueError, match="needs query_text"):
        similarity_search_batch(
            spark, corpus, docs, ["lang"],
            queries.select("query_id", F.lit([0.0] * 16).alias("query_vec")),
            num_results=5, dim=16, query_type="maxsim",
        )
    with pytest.raises(ValueError, match="token-vector corpus"):
        similarity_search_batch(
            spark, docs, docs, ["lang"], queries,
            num_results=5, dim=16, query_type="maxsim",
        )


def test_maxsim_graph_token_index_mode(spark, tmp_path):
    """maxsim_token_index accepts the GRAPH token index through the
    facade (r9 built the routing, r10 exercises it facade-level): the
    beam's top tokens unpack to docs, the gather+exact-rerank recovers
    >= 6/8 of the exact facade top-8 — the measured recall floor that is
    the graph rung's contract (beam search is approximate at any ef, so
    no full-probe==exact claim)."""
    from vector_search_databricks_poc_spark.operators.multivec import (
        build_token_index,
        multi_vector_expr,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha{i % 5} bravo{i % 7} charlie{i % 11} delta{i % 13}",
          "en" if i % 2 == 0 else "de", "web")
         for i in range(60)],
        "doc_id long, text string, lang string, source string",
    )
    corpus = docs.select(
        F.col("doc_id").alias("vec_id"),
        multi_vector_expr("text", dim=16, max_tokens=32, portable=True)
        .alias("token_vecs"),
    ).localCheckpoint()
    gidx = build_token_index(
        corpus, str(tmp_path / "tok_graph"), id_col="vec_id",
        kind="graph", k_centroids=2, deg=8,
    )
    qt = "alpha3 bravo4 charlie5"
    exact = similarity_search(
        spark, corpus, docs, ["lang"],
        query_text=qt, num_results=8, dim=16, query_type="maxsim",
    ).collect()
    got = similarity_search(
        spark, corpus, docs, ["lang"],
        query_text=qt, num_results=8, dim=16, query_type="maxsim",
        maxsim_m=48, nprobe=2, maxsim_token_index=gidx,
    ).collect()
    ex_ids = {r["vec_id"] for r in exact}
    got_ids = {r["vec_id"] for r in got}
    assert len(ex_ids & got_ids) >= 6, (ex_ids, got_ids)
    # payload joins back through the same path as every other kind
    assert set(got[0].asDict()) == {"vec_id", "lang", "score"}


def test_maxsim_dim_mismatch_fails_fast(spark, docs):
    """A query encoded at the facade's default dim=64 against a dim=16
    token corpus used to NULL-pad every zip_with dot and silently return
    ZERO rows (ADVICE r9, medium); the in-plan guard now fails the job
    with a clear message — both facades."""
    from vector_search_databricks_poc_spark.operators.multivec import (
        multi_vector_expr,
    )
    from vector_search_databricks_poc_spark.operators.serving import (
        similarity_search_batch,
    )

    corpus = docs.select(
        F.col("doc_id").alias("vec_id"),
        multi_vector_expr("text", dim=16, max_tokens=32, portable=True)
        .alias("token_vecs"),
    ).localCheckpoint()
    qt = "fast hash join"
    with pytest.raises(Exception, match="dim mismatch"):
        similarity_search(
            spark, corpus, docs, ["lang"],
            query_text=qt, num_results=5, query_type="maxsim",  # dim=64 default
        ).collect()
    queries = spark.createDataFrame(
        [(0, qt)], "query_id int, query_text string"
    )
    with pytest.raises(Exception, match="dim mismatch"):
        similarity_search_batch(
            spark, corpus, docs, ["lang"], queries,
            num_results=5, query_type="maxsim",  # dim=64 default
        ).collect()


def test_batch_maxsim_single_window(spark, docs):
    """The batch maxsim facade keeps maxsim_topk_batch's rank instead of
    recomputing it over the joined payload (r9 verdict #5): exactly ONE
    Window in the executed plan, and the hits side broadcasts into the
    payload join."""
    from vector_search_databricks_poc_spark.operators.multivec import (
        multi_vector_expr,
    )
    from vector_search_databricks_poc_spark.operators.serving import (
        similarity_search_batch,
    )
    from vector_search_databricks_poc_spark.plans import audit

    corpus = docs.select(
        F.col("doc_id").alias("vec_id"),
        multi_vector_expr("text", dim=16, max_tokens=32, portable=True)
        .alias("token_vecs"),
    ).localCheckpoint()
    queries = spark.createDataFrame(
        [(0, "fast hash join"), (1, "customer order priority")],
        "query_id int, query_text string",
    )
    out = similarity_search_batch(
        spark, corpus, docs, ["lang"], queries,
        num_results=5, dim=16, query_type="maxsim",
    )
    plan = audit.plan_string(out, "simple")
    # "Window [" matches only Window operator nodes, not the
    # WindowGroupLimit pre-shuffle prune (which is expected and good)
    assert plan.count("Window [") == 1, plan[:2000]
    assert audit.uses_broadcast_join(out)
