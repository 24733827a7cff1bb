"""``similarity_search`` facade: the reference client's call shape over
this engine's own indexes.

Reference behavior: ``index.similarity_search(columns="summary",
query_text=QUERY_TEXT | query_vector=vec, num_results=2)`` returning the
endpoint's JSON response — a dict of ``manifest`` (column list) and
``result`` (``row_count`` + ``data_array``) that the caller
``json.dumps``s (query_endpoint.py:126-152; driver-side query embedding
at query_endpoint.py:83-115).  This module is that surface re-expressed
over the engine: one entry point that takes EITHER a query text (embedded
on the driver through the same encoder as the corpus — the reference's
contract) or a raw vector, dispatches to whichever index kind is handed
in (brute corpus scan, IVF, IVF-PQ, graph, binary-quant, PCA), optionally applies the
``filters`` dict (operators/filters.py mini-language, post-filter over
the candidate list), joins the requested payload columns back, and
returns a DataFrame — plus ``to_response`` to render the reference's
response dict from it.

100 TB shape: everything downstream of the index probe touches only the
k-row (or over_fetch·k-row) hit list — the hits side broadcasts into the
documents join, the filter trims candidates, and the payload fetch never
scans the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.embedding import embed_text
from .filters import postfilter_hits
from .topk import top_k_similar


def similarity_search(
    spark: SparkSession,
    index,
    documents: DataFrame,
    columns,
    query_text: str | None = None,
    query_vector=None,
    num_results: int = 10,
    filters: dict | None = None,
    dim: int = 64,
    nprobe: int = 4,
    over_fetch: int = 4,
    doc_id_col: str = "doc_id",
    source: DataFrame | None = None,
    query_type: str = "ann",
    text_col: str = "text",
    max_tokens: int = 32,
    maxsim_m: int | None = None,
    maxsim_token_index=None,
) -> DataFrame:
    """One similarity query, reference call shape.

    ``index`` dispatches on kind: a DataFrame is treated as the brute
    corpus (id + vector columns, exact scan); an ``IvfIndex`` /
    ``IvfPqIndex`` / ``GraphIndex`` handle probes its table
    (``IvfPqIndex`` needs ``source`` — the float vectors for its exact
    rerank).  ``columns`` is a name or list of names from ``documents``
    to return alongside (id, score), exactly the reference's ``columns=``.

    Exactly one of ``query_text`` / ``query_vector`` (the reference's two
    call modes).  Text is embedded ON THE DRIVER through the same hashing
    encoder as the corpus (dim must match the index build) — the
    reference embeds query text driver-side the same way.

    ``filters`` post-filters the candidate list (any index kind) with
    ``over_fetch``·k candidates fetched to survive the trim; under-fill
    below k is honest (see operators/filters.py).

    ``query_type`` mirrors the endpoint's knob: ``"ann"`` (default,
    vector-only), ``"hybrid"`` — BM25 over ``documents[text_col]``
    fused with the vector leg by reciprocal-rank fusion
    (operators/hybrid.py), requiring ``query_text`` (the lexical leg
    tokenizes it) — or ``"maxsim"`` (r8) — multi-vector late
    interaction: ``index`` must be a token-vector corpus DataFrame
    (id + ``token_vecs`` built with multivec.multi_vector_pandas — or the
    bit-identical expression form over a MATERIALIZED column — at
    ``dim``/``max_tokens``; ``dim`` MUST equal the corpus encoder's dim:
    the facade default is 64, token corpora are often narrower, and a
    mismatch is guarded in-plan — the job fails with a clear message
    instead of NULL-scoring everything to zero rows),
    ``query_text`` is encoded driver-side by
    the bit-identical pure-Python twin (no Spark action), scoring is
    exact MaxSim (or retrieve-then-rerank when ``maxsim_m`` is set) and
    ``filters`` become an exact metadata prefilter.
    ``maxsim_token_index`` (r9, requires ``maxsim_m``) routes stage 1
    through an IVF token index built with ``multivec.build_token_index``
    — each query token probes ``nprobe`` centroid partitions of the
    token table instead of scanning it (the 100 TB shape).  The filter
    prefilter still applies to stage 2's corpus, but the index probe
    itself is unfiltered: a tight filter can under-fill below k — widen
    ``maxsim_m``/``nprobe`` (same honesty contract as the other index
    postfilter paths).  The hybrid vector leg scans the vectors the
    handle holds (index tables carry them), exact over the corpus —
    hybrid is a recall-first mode.
    """
    if (query_text is None) == (query_vector is None):
        raise ValueError("pass exactly one of query_text / query_vector")
    if query_type not in ("ann", "hybrid", "maxsim"):
        raise ValueError(
            f"query_type must be ann|hybrid|maxsim, got {query_type!r}"
        )
    cols = [columns] if isinstance(columns, str) else list(columns)

    if query_type == "maxsim":
        if query_text is None:
            raise ValueError("query_type='maxsim' needs query_text")
        from .filters import filter_expr
        from .multivec import (
            assert_token_dim,
            maxsim_topk,
            maxsim_topk_indexed,
            maxsim_topk_pruned,
            py_multi_vector,
        )

        if not (isinstance(index, DataFrame) and "token_vecs" in index.columns):
            raise ValueError(
                "query_type='maxsim' needs a token-vector corpus DataFrame "
                "(id + token_vecs via multivec.multi_vector_pandas or the materialized expression form)"
            )
        id_col = "vec_id" if "vec_id" in index.columns else doc_id_col
        qvs = py_multi_vector(query_text, dim=dim, max_tokens=max_tokens)
        # dim must match the corpus encoder (the facade default is 64;
        # most token corpora are built narrower) — a mismatch would
        # NULL-pad every zip_with dot and silently return zero rows, so
        # guard in-plan: the job fails with a clear message instead
        corpus = assert_token_dim(index, dim)
        if filters:
            # exact prefilter: same single-scan cost, always fills k
            allowed = documents.where(filter_expr(filters)).select(
                F.col(doc_id_col).alias(id_col)
            )
            corpus = corpus.join(allowed, id_col, "left_semi")
        if maxsim_token_index is not None:
            if maxsim_m is None:
                raise ValueError("maxsim_token_index requires maxsim_m")
            hits = maxsim_topk_indexed(
                spark, corpus, maxsim_token_index, qvs,
                k=num_results, m=maxsim_m, nprobe=nprobe, id_col=id_col,
            )
        elif maxsim_m is not None:
            hits = maxsim_topk_pruned(
                corpus, qvs, k=num_results, m=maxsim_m, id_col=id_col
            )
        else:
            hits = maxsim_topk(corpus, qvs, k=num_results, id_col=id_col)
        payload = documents.select(F.col(doc_id_col).alias(id_col), *cols)
        return (
            payload.join(F.broadcast(hits), id_col)
            .select(id_col, *cols, "score")
            .orderBy(F.desc("score"), F.col(id_col))
            .limit(num_results)
        )
    if query_text is not None:
        # The query must be embedded at the index's dimension — validate
        # dim against the handle's centroids up front (stream_graph_sync
        # does the same) instead of failing deep inside zip_with.
        idx_centroids = getattr(index, "centroids", None)
        if idx_centroids:
            cdim = len(idx_centroids[0])
            if dim != cdim:
                raise ValueError(
                    f"dim={dim} does not match the index centroid "
                    f"dimension {cdim} — embed the query at the dim the "
                    "index was built with"
                )
        edim = getattr(index, "expected_dim", None)
        if edim is not None and dim != edim:
            raise ValueError(
                f"dim={dim} does not match the index dimension {edim} — "
                "embed the query at the dim the index was built with"
            )
        row = embed_text(
            spark.createDataFrame([(query_text,)], "text string"), dim=dim
        ).first()
        query_vector = list(row["embedding"])
    query_vector = [float(x) for x in query_vector]

    k = num_results
    fetch = over_fetch * k if filters else k
    from .binary_quant import BinaryIndex
    from .graph_ann import GraphIndex
    from .index import IvfIndex, IvfPqIndex
    from .pca import PcaIndex

    if query_type == "hybrid":
        if query_text is None:
            raise ValueError("query_type='hybrid' needs query_text")
        from .hybrid import hybrid_search

        terms = [t for t in query_text.lower().split() if t]
        if isinstance(index, DataFrame):
            id_col, vectors = "vec_id", index
        elif isinstance(index, (IvfIndex, IvfPqIndex, GraphIndex)):
            id_col = index.id_col
            if isinstance(index, IvfPqIndex):
                if source is None:
                    raise ValueError(
                        "IvfPqIndex holds codes, not vectors — hybrid needs source="
                    )
                vectors = source.select(id_col, index.vec_col)
            else:
                vectors = spark.read.parquet(index.path).select(
                    id_col, index.vec_col
                )
        elif isinstance(index, (BinaryIndex, PcaIndex)):
            id_col = index.id_col
            vectors = index.table.select(id_col, index.vec_col)
        else:
            raise ValueError(f"unsupported index kind {type(index).__name__}")
        hits = hybrid_search(
            documents.select(F.col(doc_id_col).alias(id_col), text_col),
            vectors,
            terms,
            query_vector,
            k=fetch,
            id_col=id_col,
            vec_id_col=id_col,
        ).select(id_col, F.col("rrf").alias("score"))
    elif isinstance(index, DataFrame):
        id_col = "vec_id"
        if filters:
            # Brute scan + filters: prefilter is EXACT and fills k at the
            # same single-scan cost, while over-fetch+postfilter can
            # under-fill below k — semi-join the allowed doc ids into the
            # corpus before ranking and skip the postfilter entirely.
            from .filters import filter_expr

            allowed = documents.where(filter_expr(filters)).select(
                F.col(doc_id_col).alias(id_col)
            )
            # No broadcast hint: a permissive filter keeps most ids, and
            # AQE picks broadcast itself when the survivor set is small.
            hits = top_k_similar(
                index.join(allowed, id_col, "left_semi"),
                query_vector,
                k=k,
                id_col=id_col,
            )
            filters = None
        else:
            hits = top_k_similar(index, query_vector, k=fetch, id_col=id_col)
    elif isinstance(index, GraphIndex):
        id_col = index.id_col
        hits = index.search(
            spark, query_vector, k=fetch, ef=max(32, 2 * fetch), nprobe=nprobe
        )
    elif isinstance(index, IvfPqIndex):
        if source is None:
            raise ValueError("IvfPqIndex needs source= (float vectors) for rerank")
        id_col = index.id_col
        hits = index.search(spark, query_vector, source, k=fetch, nprobe=nprobe)
    elif isinstance(index, IvfIndex):
        id_col = index.id_col
        hits = index.search(spark, query_vector, k=fetch, nprobe=nprobe)
    elif isinstance(index, (BinaryIndex, PcaIndex)):
        id_col = index.id_col
        hits = index.search(query_vector, k=fetch)
    else:
        raise ValueError(f"unsupported index kind {type(index).__name__}")

    if filters:
        meta = (
            documents
            if id_col == doc_id_col
            else documents.withColumn(id_col, F.col(doc_id_col))
        )
        hits = postfilter_hits(hits, meta, filters, k, id_col=id_col)

    payload = documents.select(F.col(doc_id_col).alias(id_col), *cols)
    return (
        payload.join(F.broadcast(hits), id_col)
        .select(id_col, *cols, "score")
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def similarity_search_batch(
    spark: SparkSession,
    index,
    documents: DataFrame,
    columns,
    queries: DataFrame,
    num_results: int = 10,
    filters: dict | None = None,
    dim: int = 64,
    nprobe: int = 4,
    over_fetch: int = 4,
    doc_id_col: str = "doc_id",
    source: DataFrame | None = None,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    query_vec_col: str = "query_vec",
    query_type: str = "ann",
    max_tokens: int = 32,
) -> DataFrame:
    """Many queries through one plan — the batch shape of
    ``similarity_search`` (the reference client loops the endpoint one
    query at a time, query_endpoint.py:126-152; at 100 TB the loop is the
    bottleneck, so the batch facade advances every query through the SAME
    probe jobs: brute = one broadcast join, IVF/IVF-PQ = one
    partition-pruned probe per probed partition set, graph = one beam
    whose hop depth amortizes across the batch).

    ``queries`` carries ``query_id`` plus EITHER ``query_text`` (embedded
    IN-PLAN through the same hashing encoder as the corpus — no
    driver-side per-row embedding) or ``query_vec``.  ``filters`` applies
    the per-query batched postfilter (operators/filters.py::
    postfilter_batch_hits) on index paths and the exact prefiltered scan
    on the brute path (same under-fill honesty as the single-query
    facade).  IVF-PQ candidates are exact-rescored against ``source``
    float vectors before the final rank (the single-path rerank
    contract).

    ``query_type='maxsim'`` (r9) is the batch late-interaction mode:
    ``index`` must be a token-vector corpus DataFrame (id +
    ``token_vecs``), ``queries`` must carry ``query_text`` — every query
    is token-encoded IN-PLAN by the Arrow twin and scored through ONE
    broadcast MaxSim cross join (multivec.maxsim_topk_batch); ``filters``
    become the exact metadata prefilter, as in the single-query facade.
    ``dim`` must match the corpus encoder's dim (guarded in-plan — a
    mismatch fails the job instead of silently returning zero rows).

    Returns (query_id, <id>, *columns, score, rank) with rank <= k dense
    per query.
    """
    from ..functions.embedding import hashing_embedding
    from .binary_quant import BinaryIndex
    from .filters import filter_expr, postfilter_batch_hits
    from .graph_ann import GraphIndex
    from .index import IvfIndex, IvfPqIndex
    from .pca import PcaIndex
    from .similarity_join import brute_force_topk_join

    k = num_results
    fetch = over_fetch * k if filters else k
    if query_type not in ("ann", "maxsim"):
        raise ValueError(
            f"query_type must be ann|maxsim for the batch facade, got {query_type!r}"
        )
    if query_type == "maxsim":
        from .multivec import (
            assert_token_dim,
            maxsim_topk_batch,
            multi_vector_pandas,
        )

        if not (isinstance(index, DataFrame) and "token_vecs" in index.columns):
            raise ValueError(
                "query_type='maxsim' needs a token-vector corpus DataFrame "
                "(id + token_vecs via multivec.multi_vector_pandas)"
            )
        if query_text_col not in queries.columns:
            raise ValueError("batch query_type='maxsim' needs query_text")
        id_col = "vec_id" if "vec_id" in index.columns else doc_id_col
        qv = queries.select(
            F.col(query_id_col),
            multi_vector_pandas(
                query_text_col, dim=dim, max_tokens=max_tokens
            ).alias("query_vecs"),
        )
        # in-plan dim guard: a query encoded at the wrong dim would
        # NULL-pad every dot and silently return zero rows
        corpus = assert_token_dim(index, dim)
        if filters:
            # exact prefilter: same single-scan cost, always fills k
            allowed = documents.where(filter_expr(filters)).select(
                F.col(doc_id_col).alias(id_col)
            )
            corpus = corpus.join(allowed, id_col, "left_semi")
        # maxsim_topk_batch already emits rank 1..k per query — keep it
        # (ONE Window in the whole plan) and broadcast the (N·k)-row
        # hits side into the payload join, rather than recomputing the
        # identical window over the joined payload (r9 verdict #5)
        hits = maxsim_topk_batch(
            corpus, qv, k=k, id_col=id_col, query_id_col=query_id_col
        ).select(
            F.col("query_id").alias(query_id_col), id_col, "score", "rank"
        )
        cols = [columns] if isinstance(columns, str) else list(columns)
        payload = documents.select(F.col(doc_id_col).alias(id_col), *cols)
        return payload.join(F.broadcast(hits), id_col).select(
            query_id_col, id_col, *cols, "score", "rank"
        )
    has_text = query_text_col in queries.columns
    has_vec = query_vec_col in queries.columns
    if has_text == has_vec:
        raise ValueError(
            f"queries must carry exactly one of {query_text_col!r} / "
            f"{query_vec_col!r}"
        )
    if has_text:
        idx_centroids = getattr(index, "centroids", None)
        if idx_centroids and dim != len(idx_centroids[0]):
            raise ValueError(
                f"dim={dim} does not match the index centroid dimension "
                f"{len(idx_centroids[0])}"
            )
        edim = getattr(index, "expected_dim", None)
        if edim is not None and dim != edim:
            raise ValueError(
                f"dim={dim} does not match the index dimension {edim}"
            )
        queries = queries.select(
            query_id_col,
            hashing_embedding(query_text_col, dim=dim)
            .cast("array<double>")
            .alias(query_vec_col),
        )
    else:
        queries = queries.select(
            query_id_col, F.col(query_vec_col).cast("array<double>").alias(query_vec_col)
        )

    if isinstance(index, DataFrame):
        id_col = "vec_id"
        corpus = index
        if filters:
            # exact prefilter: same single-scan cost, always fills k
            allowed = documents.where(filter_expr(filters)).select(
                F.col(doc_id_col).alias(id_col)
            )
            corpus = corpus.join(allowed, id_col, "left_semi")
            fetch = k
            filters = None
        hits = brute_force_topk_join(
            queries, corpus, k=fetch, query_id_col=query_id_col,
            query_vec_col=query_vec_col, id_col=id_col,
        ).select(query_id_col, id_col, "score")
    elif isinstance(index, GraphIndex):
        id_col = index.id_col
        hits = index.batch_search(
            spark, queries, k=fetch, ef=max(32, 2 * fetch), nprobe=nprobe,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
        ).select(query_id_col, id_col, "score")
    elif isinstance(index, IvfPqIndex):
        if source is None:
            raise ValueError("IvfPqIndex needs source= (float vectors) for rerank")
        id_col = index.id_col
        cand = index.batch_search(
            spark, queries, k=4 * fetch, nprobe=nprobe,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
        ).select(query_id_col, id_col)
        # exact rescore of the quantized candidates (single-path contract)
        from .. import vectors as V

        vecs = source.select(id_col, F.col(index.vec_col).alias("_v"))
        qn = queries.select(
            query_id_col, V.l2_normalize(F.col(query_vec_col)).alias("_qv")
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.desc("_s"), F.col(id_col)
        )
        hits = (
            cand.join(vecs, id_col)
            .join(F.broadcast(qn), query_id_col)
            .select(
                query_id_col, id_col,
                V.dot(V.l2_normalize(F.col("_v")), F.col("_qv")).alias("_s"),
            )
            .withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= fetch)
            .select(query_id_col, id_col, F.round("_s", 6).alias("score"))
        )
    elif isinstance(index, IvfIndex):
        id_col = index.id_col
        hits = index.batch_search(
            spark, queries, k=fetch, nprobe=nprobe,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
        ).select(query_id_col, id_col, "score")
    elif isinstance(index, (BinaryIndex, PcaIndex)):
        id_col = index.id_col
        hits = index.batch_search(
            queries, k=fetch,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
        ).select(query_id_col, id_col, "score")
    else:
        raise ValueError(f"unsupported index kind {type(index).__name__}")

    if filters:
        meta = (
            documents
            if id_col == doc_id_col
            else documents.withColumn(id_col, F.col(doc_id_col))
        )
        hits = postfilter_batch_hits(
            hits, meta, filters, k, id_col=id_col, query_id_col=query_id_col
        ).select(query_id_col, id_col, "score")

    cols = [columns] if isinstance(columns, str) else list(columns)
    payload = documents.select(F.col(doc_id_col).alias(id_col), *cols)
    wk = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        payload.join(hits, id_col)
        .withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, *cols, "score", "rank")
    )


def to_response_batch(df: DataFrame, query_id_col: str = "query_id") -> dict:
    """Render a batched search result as {query_id: endpoint response
    dict} — one reference-shaped response per query (the manifest omits
    the query id column; rows are ordered by rank).  Collects — call on
    (batch × k)-row results only."""
    rows = df.collect()
    cols = [c for c in df.columns if c not in (query_id_col, "rank")]
    out: dict = {}
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r[query_id_col], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        out[qid] = {
            "manifest": {
                "column_count": len(cols),
                "columns": [{"name": c} for c in cols],
            },
            "result": {
                "row_count": len(rs),
                "data_array": [[r[c] for c in cols] for r in rs],
            },
        }
    return out


def to_response(df: DataFrame) -> dict:
    """Render a search result DataFrame as the endpoint response dict the
    reference json.dumps's: ``{"manifest": {"column_count", "columns":
    [{"name": ...}]}, "result": {"row_count", "data_array"}}``
    (query_endpoint.py:132,147).  Collects — call on k-row results only."""
    rows = df.collect()
    cols = df.columns
    return {
        "manifest": {
            "column_count": len(cols),
            "columns": [{"name": c} for c in cols],
        },
        "result": {
            "row_count": len(rows),
            "data_array": [[r[c] for c in cols] for r in rows],
        },
    }
