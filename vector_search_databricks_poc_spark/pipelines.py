"""End-to-end pipeline assembly (SURVEY.md §3.1/§3.2 equivalents).

The reference's two notebook jobs, re-expressed as single DataFrame jobs:

- §3.1 ``build_index_pipeline``: ingest -> clean -> embed -> normalize ->
  IVF-partitioned index table (replaces create_table_and_index +
  create_delta_sync_index, syntetic_data_arxiv.py + syntetic_data.py:95-107).
- §3.2 ``search_pipeline``: query text -> embed through the SAME encoder
  path -> top-k against the index -> dedup/clean -> context assembly
  (replaces query_endpoint.py + backend main.py's retrieval half).

Batch-oriented per the north star ("bulk index building and batch similarity
searches, not online ANN serving"): the "endpoint" is a job, matching the
reference's TRIGGERED pipeline semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.embedding import embed_text
from .operators.index import build_ivf_index
from .operators.rag import assemble_context, clean_hits


def build_index_pipeline(
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    encoder: str = "hashing",
    dim: int = 64,
    k_centroids: int = 16,
    kind: str = "ivf",
):
    """§3.1 as one lazy DataFrame job: no intermediate materialization
    except the final partitioned index write.  ``kind`` picks the index
    layout: ``"ivf"`` (float vectors, exact in-partition rescoring),
    ``"ivf_pq"`` (residual PQ codes — the smaller-at-rest scale path), or
    ``"graph"`` (pruned k-NN adjacency, beam-searched —
    operators/graph_ann.py)."""
    from .operators.text import collapse_whitespace

    cleaned = docs.select(
        F.col(id_col), collapse_whitespace(text_col).alias(text_col)
    ).where(F.col(text_col) != "")
    embedded = embed_text(cleaned, text_col=text_col, out_col="embedding",
                          encoder=encoder, dim=dim)
    if kind == "ivf_pq":
        from .operators.index import build_ivf_pq_index

        return build_ivf_pq_index(
            embedded, index_path, id_col=id_col, vec_col="embedding",
            k_centroids=k_centroids,
        )
    if kind == "graph":
        from .operators.graph_ann import build_graph_index

        return build_graph_index(
            embedded, index_path, id_col=id_col, vec_col="embedding",
            k_centroids=k_centroids,
        )
    if kind != "ivf":
        raise ValueError(f"kind must be 'ivf', 'ivf_pq' or 'graph', got {kind!r}")
    return build_ivf_index(
        embedded, index_path, id_col=id_col, vec_col="embedding",
        k_centroids=k_centroids,
    )


def prepare_training_data(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.7,
    test_fraction: float = 0.1,
    cluster_exact: bool = False,
    cluster_keeper: str = "min_id",
    gopher_gate: bool = False,
    gopher_thresholds: dict[str, float] | None = None,
    substring_dedup_tokens: int | None = None,
    quality_model=None,
    quality_model_threshold: float = 0.5,
    lm_model=None,
    lm_max_logppl: float | None = None,
    dsir_target: DataFrame | None = None,
    dsir_n: int | None = None,
    dsir_buckets: int = 10_000,
    dsir_temperature: float = 1.0,
    decontam_benchmark: DataFrame | None = None,
    decontam_ngrams: int = 13,
) -> tuple[DataFrame, DataFrame]:
    """The north-star LLM-data-prep pipeline, composed from the engine's
    operators in the canonical order a 100 TB corpus runs them:

      [Gopher gate] -> clean -> language filter -> quality filter ->
      exact dedup -> MinHash near-dup removal -> train/test split

    Cheap row-local filters run FIRST (pushdown-friendly, shrink the
    corpus before any shuffle); exact dedup next (one shuffle); the
    near-dup stage runs on the survivors only.  Near-dup removal keeps
    each pair's min id greedily, or the exact per-cluster representative
    via connected components when ``cluster_exact`` (iterative — runs
    jobs); with ``cluster_exact`` the representative policy is
    ``cluster_keeper``: ``"min_id"`` (default) or ``"quality"`` (each
    cluster keeps its highest-``quality_score`` member — min-id keeping
    discards the clean copy of a duplicated document about half the
    time).  The split is arithmetic, so membership is stable across
    runs, partitionings, and engines.

    ``gopher_gate`` prepends the repetition/shape keep-drop gate
    (operators/text.py::quality_gate, thresholds overridable) — it MUST
    run on the RAW text, before ``collapse_whitespace`` flattens the
    line/paragraph structure the duplicate-line signals measure; off by
    default so existing pipelines keep their row counts.

    The r6 stages compose in the published order, all off by default:
    ``quality_model`` (+``quality_model_threshold``) applies the trained
    reference-vs-crawl classifier (operators/quality_model.py) after the
    heuristic filters; ``lm_model`` + ``lm_max_logppl`` applies the
    CCNet perplexity cut (operators/lm.py) beside it; both models are
    PRE-FITTED by the caller (fits are training jobs — this builder
    stays lazy).  ``substring_dedup_tokens`` runs exact
    duplicated-substring removal (operators/dedup.py ExactSubstr) after
    document-level dedup, where the paper places it.

    ``decontam_benchmark`` drops documents sharing any
    ``decontam_ngrams``-gram with the benchmark frame (operators/text.py
    ::decontaminate, broadcast anti-join) — after dedup, before
    selection; for eval sets too large to hash exactly, run
    ``operators.bloom`` decontamination as a separate stage instead.

    ``dsir_target`` + ``dsir_n`` append DSIR importance resampling
    (operators/dsir.py) as the LAST corpus transform — data selection
    runs on the cleaned, deduped survivors (its raw distribution), so
    the fitted weights describe what training would actually see.  The
    selection keeps ``dsir_n`` docs (Gumbel top-k, deterministic) with
    their ``dsir_score`` attached; the split then divides the selected
    set.  Fully lazy (the fit is in-plan aggregation).

    Returns (train, test) DataFrames — both lazy (greedy path).
    """
    from .operators.dedup import exact_dedup, minhash_near_dup_pairs
    from .operators.sampling import train_test_split
    from .operators.text import (
        collapse_whitespace,
        lang_id_heuristic,
        language_filter,
        quality_gate,
        quality_score,
    )

    if gopher_gate:
        docs = (
            quality_gate(docs, text_col=text_col, thresholds=gopher_thresholds)
            .where(F.col("keep"))
            .drop("keep", "drop_reasons")
        )
    cleaned = docs.withColumn(
        text_col, collapse_whitespace(text_col)
    ).where(F.col(text_col) != "")
    if lang_col is not None and lang_col in docs.columns:
        kept = language_filter(cleaned, list(langs), lang_col)
    else:
        kept = cleaned.where(lang_id_heuristic(text_col).isin(list(langs)))
    kept = kept.where(quality_score(text_col) >= min_quality)
    if quality_model is not None:
        from .operators.quality_model import quality_classifier_filter

        kept = quality_classifier_filter(
            kept, quality_model, text_col, quality_model_threshold
        )
    if lm_model is not None:
        if lm_max_logppl is None:
            raise ValueError("lm_model given without lm_max_logppl")
        from .operators.lm import perplexity_filter

        kept = perplexity_filter(kept, lm_model, lm_max_logppl, text_col)
    kept = exact_dedup(kept, [text_col], id_col)
    if substring_dedup_tokens:
        from .operators.dedup import exact_substring_dedup

        cut = exact_substring_dedup(
            kept, id_col, text_col, window_tokens=substring_dedup_tokens
        ).where(F.col(text_col) != "")
        kept = kept.drop(text_col).join(
            cut.select(id_col, text_col), id_col
        )

    # The DAG downstream references `kept` in several branches (near-dup
    # signature + verify legs, the keeper join/anti-join) and Spark
    # re-executes the whole upstream per branch.  That's fine when
    # upstream is pushdown-pruned parquet scans + codegen filters, but a
    # Python-UDF stage (Gopher gate / quality classifier / LM scorer)
    # re-runs its Arrow batches once PER BRANCH — checkpoint the
    # survivors once in that case (lazy: materializes on first action).
    # Fan-out is structural, never single-consumer: every path below
    # consumes `kept` at least twice — once inside
    # minhash_near_dup_pairs (signature legs) and once as the join /
    # anti-join left side of whichever keeper policy runs — so the
    # materialization is never paid without a second consumer to save.
    if gopher_gate or quality_model is not None or lm_model is not None:
        kept = kept.localCheckpoint(eager=False)
    pairs = minhash_near_dup_pairs(kept, id_col=id_col, text_col=text_col,
                                   threshold=near_dup_threshold)
    if cluster_keeper not in ("min_id", "quality"):
        raise ValueError(
            f"cluster_keeper must be 'min_id' or 'quality', got {cluster_keeper!r}"
        )
    if cluster_keeper == "quality" and not cluster_exact:
        raise ValueError(
            "cluster_keeper='quality' requires cluster_exact=True - the "
            "greedy path has no clusters to elect a keeper from"
        )
    if cluster_exact:
        from .operators.components import dedup_clusters, quality_dedup_keepers
        from .operators.text import _free_colname

        if cluster_keeper == "quality":
            # keep each cluster's HIGHEST-heuristic-quality member instead
            # of the min id - min-id keeping discards the clean copy of a
            # duplicated document about half the time
            qname = _free_colname(kept, "_kq")
            scored = kept.withColumn(qname, quality_score(text_col))
            deduped = (
                quality_dedup_keepers(scored, pairs, id_col, qname)
                .where(F.col("is_keeper"))
                .drop("representative", "is_keeper", qname)
            )
        else:
            rep = dedup_clusters(kept, pairs, id_col)
            deduped = rep.where(F.col("representative") == F.col(id_col)).drop("representative")
    else:
        # greedy: drop the larger id of every near-dup pair (transitive
        # chains may keep one extra doc per chain — the standard tradeoff
        # to stay single-pass)
        drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
        deduped = kept.join(drop, id_col, "left_anti")

    if decontam_benchmark is not None:
        # GPT-3-style eval decontamination: drop any doc sharing a
        # decontam_ngrams-gram with the benchmark — AFTER dedup (fewer
        # docs to hash) and BEFORE selection (DSIR must weigh the pool
        # that will actually ship)
        from .operators.text import decontaminate

        deduped = decontaminate(
            deduped, decontam_benchmark, id_col=id_col, text_col=text_col,
            n=decontam_ngrams,
        )

    if (dsir_target is None) != (dsir_n is None):
        raise ValueError("dsir_target and dsir_n must be given together")
    if dsir_target is not None:
        from .operators.dsir import dsir_select

        sel = dsir_select(
            deduped.select(id_col, text_col),
            dsir_target.select(id_col, text_col),
            n=dsir_n,
            id_col=id_col,
            text_col=text_col,
            buckets=dsir_buckets,
            temperature=dsir_temperature,
        )
        # equi-join (NOT broadcast-forced): dsir_n can be corpus-scale
        deduped = deduped.join(
            sel.select(id_col, "dsir_score"), id_col
        )

    return train_test_split(deduped, id_col, test_fraction=test_fraction)


def crawl_corpus_pipeline(
    spark,
    wet_glob: str,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.7,
    test_fraction: float = 0.1,
    gopher_gate: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Crawl shards in, training corpus out — the full 100 TB front half:

      read_wet (streaming WARC record decode, one shard = one task) ->
      canonical ids + domain -> prepare_training_data (Gopher gate ->
      clean -> language -> quality -> exact dedup -> near-dup -> split)

    ``doc_id = xxhash64(url)``: deterministic and join-stable with NO
    global sequence (``monotonically_increasing_id`` would renumber on
    every run/partitioning, breaking dedup keepers and split membership
    across incremental crawls).  A 64-bit id collides only past ~4e9
    urls, and a collision lands in the EXACT-DEDUP keeper path — two
    colliding docs keep one representative, indistinguishable from an
    intended dedup — so the failure mode is benign for corpus prep.

    ``domain`` (host part of the url) rides along for the downstream
    mixture stages (assemble_training_corpus / temperature sampling).
    Language comes from the n-gram heuristic since crawl text carries no
    trusted lang column.  Everything stays lazy; nothing driver-side.
    """
    from .operators.text import url_host
    from .sources.warc import read_wet

    wet = read_wet(spark, wet_glob)
    docs = wet.select(
        F.xxhash64("url").alias("doc_id"),
        # url_host, not an ad-hoc regex: lowercased, port/userinfo/query
        # stripped — ad-hoc extraction here skewed the downstream
        # per-domain mixture ('A.COM' vs 'a.com:443' vs 'a.com?q=1')
        url_host(F.col("url")).alias("domain"),
        "url",
        "text",
    )
    # LAZY localCheckpoint (the sources/files.py pattern): downstream the
    # corpus fans out into shuffle-free branches (the MinHash signature
    # stage deliberately has no exchange to reuse), and without this each
    # branch would re-read and re-gunzip every WET shard — the plan showed
    # 15 scans of the shard files.  One materialized decode, blocks
    # released by the ContextCleaner when the returned frames go away.
    docs = docs.localCheckpoint(eager=False)
    return prepare_training_data(
        docs,
        id_col="doc_id",
        text_col="text",
        lang_col=None,
        langs=langs,
        min_quality=min_quality,
        near_dup_threshold=near_dup_threshold,
        test_fraction=test_fraction,
        gopher_gate=gopher_gate,
    )


def assemble_training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str | None = None,
    mixture: dict[str, float] | None = None,
    mixture_unit: str = "docs",
    redact: bool = True,
    pack_budget: int = 2048,
    pack_groups: int = 64,
    n_shards: int = 1024,
    vec_col: str | None = None,
    semdedup_eps: float | None = None,
    semdedup_clusters: int = 1024,
) -> DataFrame:
    """The assembly tail of the data-prep pipeline — run on the TRAIN side
    of :func:`prepare_training_data`:

      [semantic dedup] -> PII redaction -> domain-mixture resample ->
      token count -> sequence packing -> shard assignment

    Everything is deterministic arithmetic (same packs/shards every run,
    any cluster size); the result is lazy and ready for
    ``write_sharded``-style output partitioned by ``shard``.

    ``vec_col`` + ``semdedup_eps`` prepend SemDeDup
    (operators/semdedup.py, lazy seeded path) when the corpus carries an
    embedding column — semantic dedup runs FIRST so the mixture and the
    packs are computed over the semantically-unique survivors, not
    inflated by near-copies.  For the actual packed-id tensors, follow
    with ``functions.bpe.bpe_encode_ids_udf`` +
    ``operators.packing.pack_token_ids`` (kept out of this builder: it
    changes the output granularity from documents to sequences).

    ``mixture_unit`` selects what the mixture weights measure:
    ``"docs"`` (default) resamples document COUNTS to the target shares
    (:func:`~.operators.packing.domain_mixture_sample`); ``"tokens"``
    resamples token MASS (:func:`~.operators.packing.
    token_budget_mixture_sample`) — the unit training budgets are
    actually specified in, immune to per-domain length skew.  Token
    counts are computed on the post-redaction text either way, so the
    budget reflects what actually ships.
    """
    from .operators.packing import (
        domain_mixture_sample,
        pack_sequences,
        shard_assignment,
        token_budget_mixture_sample,
    )
    from .operators.text import redact_pii, token_count

    if mixture and not domain_col:
        raise ValueError(
            "mixture given without domain_col - the resample would be "
            "silently skipped and a misconfigured training mix would ship"
        )
    if mixture_unit not in ("docs", "tokens"):
        raise ValueError(f"mixture_unit must be 'docs' or 'tokens', got {mixture_unit!r}")
    if (vec_col is None) != (semdedup_eps is None):
        raise ValueError("vec_col and semdedup_eps must be given together")
    out = docs
    if vec_col is not None:
        from .operators.semdedup import semantic_dedup

        keepers = semantic_dedup(
            out, id_col=id_col, vec_col=vec_col, eps=semdedup_eps,
            k_clusters=semdedup_clusters,
        ).where(F.col("is_keeper")).select(id_col)
        out = out.join(keepers, id_col, "left_semi")
    if redact:
        out = out.withColumn(text_col, redact_pii(F.col(text_col)))
    out = out.withColumn("n_tokens", token_count(F.col(text_col)))
    if mixture and domain_col:
        if mixture_unit == "tokens":
            out = token_budget_mixture_sample(
                out, domain_col, mixture, tokens_col="n_tokens", id_col=id_col
            ).drop("cum_tokens")
        else:
            out = domain_mixture_sample(out, domain_col, mixture, id_col)
    out = pack_sequences(
        out, id_col=id_col, tokens_col="n_tokens",
        budget=pack_budget, n_groups=pack_groups,
    )
    return shard_assignment(out, id_col=id_col, n_shards=n_shards)


def chunked_search_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    query_text: str,
    k: int = 5,
    chunk_tokens: int = 64,
    overlap: int = 16,
    encoder: str = "hashing",
    dim: int = 64,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chunk-level retrieval with document rollup — the passage-granularity
    RAG pattern the reference's whole-document embedding misses (long docs
    dilute their best passage; SURVEY §2B-12 chunking feeds this).

    chunk (overlapping token windows) -> embed each chunk through the SAME
    encoder as queries -> cosine-score every chunk against the query (one
    broadcast one-row cross join; the query embedding never leaves the
    plan) -> roll up max chunk score per document (exact MaxSim over all
    chunks, with the best chunk kept for provenance) -> top-k docs via
    TakeOrderedAndProject.

    Scale path: chunking explodes map-side into the embed projection (no
    shuffle); the rollup is one partial-agg shuffle on doc_id; swap the
    brute-force scoring for ``IvfIndex.batch_search`` over a chunk-level
    index when the chunk count outgrows a single scan — the rollup tail is
    identical.  Returns (doc_id, score, best_chunk_seq, best_chunk_text).
    """
    from . import vectors as V
    from .operators.text import chunk_documents

    chunks = chunk_documents(
        docs, id_col=doc_id_col, text_col=text_col,
        chunk_tokens=chunk_tokens, overlap=overlap,
    )
    emb = embed_text(chunks, text_col="chunk_text", encoder=encoder, dim=dim)
    qdf = spark.createDataFrame([(query_text,)], [text_col])
    qemb = F.broadcast(
        embed_text(qdf, text_col=text_col, encoder=encoder, dim=dim).select(
            F.col("embedding").cast("array<double>").alias("_qv"),
            V.l2_norm("embedding").alias("_qn"),
        )
    )
    # norms fold once per side before the join (same fold, bit-identical)
    denom = V.l2_norm("embedding") * F.col("_qn")
    scored = emb.crossJoin(qemb).select(
        F.col(doc_id_col),
        "chunk_seq",
        "chunk_text",
        F.round(
            F.when(denom != 0, V.dot("embedding", F.col("_qv")) / denom), 6
        ).alias("_s"),
    ).where(F.col("_s").isNotNull() & ~F.isnan("_s"))
    # NULL cosine (zero query vector / empty chunk) must not fill the
    # top-k: an all-whitespace query now returns an EMPTY result instead
    # of the k lowest doc_ids dressed up as hits
    # text fetch-back joins the PRE-embedding chunks frame, so the
    # winners' text costs a re-chunk projection, never a re-embed
    return _maxsim_rollup(
        scored.select(doc_id_col, "chunk_seq", "_s"), chunks, doc_id_col, k
    )


def _maxsim_rollup(
    scored: DataFrame,
    chunk_source: DataFrame | None,
    doc_id_col: str,
    k: int,
) -> DataFrame:
    """Exact MaxSim document rollup over chunk scores ``_s``: max chunk
    score per doc with the best chunk kept for provenance (lowest
    chunk_seq breaks score ties), then top-k docs.

    Two physical strategies, chosen by the caller (both measured, r6):

    - ``chunk_source`` given — full-corpus scans (the brute path, where
      the scored set is every chunk of the corpus).  Plans as a
      partial-agg HASH aggregate (r5 verdict watch item): the
      (score, -chunk_seq) order is packed into ONE long —
      ``round(_s*1e6) << 32 | (2^31-1 - chunk_seq)`` — whose ``max`` is
      hash-aggregatable, where any struct-valued buffer (max_by or
      max-of-struct) forces Sort + SortAggregate per partition.  Exact
      because ``_s`` is already rounded to 6 decimals at the call sites
      (|score_int| <= 1e6, so the pack fits a long with 11 bits to
      spare) and chunk_seq is unique within a doc.  The winners' TEXT is
      fetched by broadcasting the k winners against ``chunk_source``
      (doc_id, chunk_seq, chunk_text) — an inner broadcast join, no
      shuffle, column pruning keeps the fetch branch free of
      embedding/scoring work.  Net at scale: chunk text never rides the
      aggregation shuffle, the agg branch never reads the text column,
      the fetch branch never reads vectors, and no partition sorts.

    - ``chunk_source=None`` — pruned probes (the indexed path).  The
      scored set is nprobe/k_centroids of the index, so the extra
      stages of the packed plan (fetch pass + broadcast barrier) cost
      MORE wall-clock than the per-partition sort they remove (measured:
      1.4s vs 1.7s at sf0.1) — one single-pass struct-ordered max, text
      carried through the aggregate, SortAggregate accepted
      deliberately."""
    if chunk_source is None:
        rolled = scored.groupBy(doc_id_col).agg(
            F.max("_s").alias("score"),
            F.max_by(
                "chunk_seq", F.struct("_s", (-F.col("chunk_seq")).alias("_t"))
            ).alias("best_chunk_seq"),
            F.max_by(
                "chunk_text", F.struct("_s", (-F.col("chunk_seq")).alias("_t"))
            ).alias("best_chunk_text"),
        )
        return rolled.orderBy(F.col("score").desc(), F.col(doc_id_col)).limit(k)
    s_int = F.round(F.col("_s") * 1e6).cast("long")
    low = F.lit((1 << 31) - 1).cast("long") - F.col("chunk_seq").cast("long")
    packed = (s_int * F.lit(1 << 32).cast("long") + low).alias("_packed")
    topk = (
        scored.select(F.col(doc_id_col), packed)
        .groupBy(doc_id_col)
        .agg(F.max("_packed").alias("_best"))
        .select(
            F.col(doc_id_col),
            (F.shiftright("_best", 32).cast("double") / 1e6).alias("score"),
            (
                F.lit((1 << 31) - 1).cast("long")
                - F.col("_best").bitwiseAND(F.lit(0xFFFFFFFF).cast("long"))
            ).alias("_best_seq"),
        )
        .orderBy(F.col("score").desc(), F.col(doc_id_col))
        .limit(k)
    )
    src = chunk_source.select(
        F.col(doc_id_col),
        F.col("chunk_seq").alias("best_chunk_seq"),
        F.col("chunk_text").alias("best_chunk_text"),
    )
    return (
        F.broadcast(topk)
        .join(
            src,
            (topk[doc_id_col] == src[doc_id_col])
            & (F.col("_best_seq") == F.col("best_chunk_seq").cast("long")),
        )
        .select(topk[doc_id_col], "score", "best_chunk_seq", "best_chunk_text")
        # the join loses TakeOrdered's order; re-sort the k-row result —
        # WITH the limit, so it plans as TakeOrderedAndProject, not a
        # range-partition exchange
        .orderBy(F.col("score").desc(), F.col(doc_id_col))
        .limit(k)
    )


def build_chunk_index(
    spark: SparkSession,
    docs: DataFrame,
    index_path: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
    encoder: str = "hashing",
    dim: int = 64,
    k_centroids: int = 16,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
):
    """§3.1 at PASSAGE granularity: chunk -> embed each chunk -> IVF index
    over the chunk vectors, carrying (doc_id, chunk_seq, chunk_text) as
    payload so retrieval needs no join back to the corpus.  This is the
    scale path :func:`chunked_search_pipeline` points at — when the chunk
    count outgrows a per-query scan, probes read ``nprobe/k_centroids`` of
    the chunk table (partition pruning) instead of scoring every chunk.

    The chunk primary key is ``doc_id#chunk_seq`` (deterministic, unique
    because chunk_seq is per-doc) — index maintenance (incremental sync,
    rebalance, compaction) applies to the chunk table unchanged.
    """
    from .operators.index import build_ivf_index
    from .operators.text import chunk_documents

    chunks = chunk_documents(
        docs, id_col=doc_id_col, text_col=text_col,
        chunk_tokens=chunk_tokens, overlap=overlap,
    )
    emb = embed_text(chunks, text_col="chunk_text", encoder=encoder, dim=dim)
    keyed = emb.select(
        F.concat_ws(
            "#", F.col(doc_id_col).cast("string"), F.col("chunk_seq").cast("string")
        ).alias("chunk_id"),
        F.col(doc_id_col), F.col("chunk_seq"), F.col("chunk_text"), F.col("embedding"),
    )
    return build_ivf_index(
        keyed, index_path, id_col="chunk_id", vec_col="embedding",
        k_centroids=k_centroids,
        extra_cols=(doc_id_col, "chunk_seq", "chunk_text"),
    )


def indexed_chunked_search(
    spark: SparkSession,
    index,
    query_text: str,
    k: int = 5,
    nprobe: int = 4,
    encoder: str = "hashing",
    dim: int = 64,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """§3.2 at passage granularity: probe a :func:`build_chunk_index` table
    and roll up exact MaxSim per document — same output schema as
    :func:`chunked_search_pipeline` (doc_id, score, best_chunk_seq,
    best_chunk_text), sub-linear chunk scoring.

    The MaxSim is exact OVER THE PROBED PARTITIONS: ``batch_search`` with
    ``k=None`` returns every scored chunk there (a top-k cut before the
    rollup would silently change doc scores), and the rollup groups on the
    doc_id payload column carried by the index.  Recall < 1 exactly as for
    any IVF probe — raise nprobe (nprobe = k_centroids is brute force).
    Fully lazy: the query embedding, probe set, and scores live in one
    plan.
    """
    qdf = spark.createDataFrame([(0, query_text)], ["query_id", "text"])
    queries = embed_text(qdf, text_col="text", encoder=encoder, dim=dim).select(
        "query_id", F.col("embedding").alias("query_vec")
    )
    scored = index.batch_search(
        spark, queries, k=None, nprobe=nprobe, score_decimals=6,
        payload_cols=(doc_id_col, "chunk_seq", "chunk_text"),
    ).select(
        F.col(doc_id_col), "chunk_seq", "chunk_text", F.col("score").alias("_s")
    ).where(F.col("_s").isNotNull() & ~F.isnan("_s"))
    # chunk_source=None: the probe is already partition-pruned, so the
    # single-pass rollup beats the packed-agg + fetch-back shape here
    # (see _maxsim_rollup's strategy note)
    return _maxsim_rollup(scored, None, doc_id_col, k)


def search_pipeline(
    spark: SparkSession,
    index,
    docs: DataFrame,
    query_text: str,
    k: int = 5,
    nprobe: int = 4,
    encoder: str = "hashing",
    dim: int = 64,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """§3.2: embed the query through the same encoder as the corpus
    (A7=A12 unification), probe the index, join text back, dedup, assemble
    the RAG context.  Returns a 1-row DataFrame with the context string.

    ``index`` is any handle :func:`build_index_pipeline` returns:
    ``IvfIndex`` (exact cosine over float vectors), ``IvfPqIndex``
    (ADC approximation over codes — relabeled ``score`` here so the
    §3.1 layouts compose with the same §3.2 tail), or ``GraphIndex``
    (beam search; eager by the graph's driver-loop nature, unlike the
    IVF branches below).

    Fully lazy on the IVF branches: the query embedding never leaves the
    plan — it flows into ``batch_search`` as a one-row DataFrame whose
    probe set and scores are pure expressions over the broadcast literal
    centroids."""
    from .operators.graph_ann import GraphIndex
    from .operators.index import IvfPqIndex

    qdf = spark.createDataFrame([(0, query_text)], ["query_id", text_col])
    queries = embed_text(qdf, text_col=text_col, encoder=encoder, dim=dim).select(
        "query_id", F.col("embedding").alias("query_vec")
    )
    if isinstance(index, GraphIndex):
        hits = index.batch_search(
            spark, queries, k=k, ef=max(32, 2 * k), nprobe=nprobe,
            score_decimals=None,
        ).drop("query_id", "rank")
    elif isinstance(index, IvfPqIndex):
        hits = (
            index.batch_search(spark, queries, k=k, nprobe=nprobe)
            .withColumnRenamed("adc", "score")
            .drop("query_id", "rank")
        )
    else:
        hits = index.batch_search(
            spark, queries, k=k, nprobe=nprobe, score_decimals=None
        ).drop("query_id", "rank")
    from .operators.topk import search_with_text

    with_text = search_with_text(
        hits, docs, id_col=index.id_col, doc_id_col=doc_id_col, text_col=text_col
    ).withColumnRenamed(index.id_col, "vec_id")
    # most-relevant-first, as the reference formats its prompt context
    return assemble_context(
        clean_hits(with_text, score_col="score"),
        order_col="score",
        ascending=False,
    )
