"""Plan-shape regression tests (SURVEY.md §4.2): the physical plans the
engine relies on at scale are asserted, not assumed."""

from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.plans import audit as A
from vector_search_databricks_poc_spark import queries_registry as R
from vector_search_databricks_poc_spark.queries_registry import QUERIES


def test_scan_pushdown_and_pruning(spark, sf_dir):
    # module function since the r6 oracle-window rotation merged the
    # declared query into scan_column_ops; the leg's plan is unchanged
    df = R.scan_filter_project(spark, sf_dir)
    assert A.has_pushed_filters(df), A.plan_string(df)
    cols = A.read_schema_columns(df)
    # projection reaches the scan: no column outside filter+select is read
    assert set(cols) <= {
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    }, cols


def test_filtered_search_pushdown_and_take_ordered(spark, sf_dir):
    """The similarity_search `filters=` path: the compiled predicate must
    reach the parquet reader (pushed filters — at 100 TB the filter prunes
    row groups before any scoring work), and the ranking must stay
    TakeOrderedAndProject (no global sort appears because a filter did)."""
    df = QUERIES["filtered_vector_search"](spark, sf_dir)
    assert A.has_pushed_filters(df), A.plan_string(df)
    assert A.uses_take_ordered(df), A.plan_string(df)


def test_flagship_topk_no_global_sort(spark, sf_dir):
    df = QUERIES["topk_cosine_search"](spark, sf_dir)
    assert A.uses_take_ordered(df), A.plan_string(df)


def test_global_topn_take_ordered(spark, sf_dir):
    df = R.global_topn(spark, sf_dir)
    assert A.uses_take_ordered(df)
    assert not A.uses_sort_merge_join(df)


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = QUERIES["join_star_revenue"](spark, sf_dir)
    assert A.uses_broadcast_join(df), A.plan_string(df)


def test_batch_similarity_join_broadcasts_queries(spark, sf_dir):
    df = R.batch_similarity_join(spark, sf_dir)
    assert A.uses_broadcast_join(df), A.plan_string(df)


def test_batch_join_group_limit_before_shuffle(spark, sf_dir):
    """Spark's WindowGroupLimit must prune per-partition top-k BEFORE the
    exchange — the shuffle then carries <= k rows per (query, map task)
    instead of the full corpus x queries score matrix."""
    df = R.batch_similarity_join(spark, sf_dir)
    s = A.plan_string(df, "simple")
    assert "WindowGroupLimit" in s and "Partial" in s, s[:2000]


def test_agg_has_single_shuffle(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    # partial+final hash agg -> exactly one exchange
    assert A.count_exchanges(df) == 1, A.plan_string(df, "simple")


def test_codegen_alive_on_relational_path(spark, sf_dir):
    # AQE wraps the plan until runtime, hiding codegen subtrees from
    # explain; plan once without it to assert codegen coverage.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = R.pricing_summary(spark, sf_dir)
        assert A.whole_stage_codegen_spans(df) >= 1, A.plan_string(df, "simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_ivf_pq_probe_is_partition_pruned(spark, sf_dir, tmp_path):
    """The IVF-PQ probe must read ONLY the nprobe centroid partitions of
    the code table — the centroid_id filter shows up as a partition
    filter, not a post-scan filter over all data."""
    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.operators.index import build_ivf_pq_index

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = build_ivf_pq_index(e, str(tmp_path / "pq"), k_centroids=8, pq_m=16, pq_k=16)
    qv = list(e.where(F.col("vec_id") == 3).first()["embedding"])
    probe = idx.search(spark, qv, source=e, k=5, nprobe=2)
    plan = A.plan_string(probe)
    assert "PartitionFilters" in plan and "centroid_id" in plan.split("PartitionFilters", 1)[1][:200], plan[:3000]


def test_indexed_chunk_search_probe_plan(spark, sf_dir, tmp_path):
    """The chunk-index probe joins the one-row query against the chunk
    table with a BROADCAST (the corpus side never shuffles for the probe),
    and the MaxSim tail is one partial-agg shuffle on doc_id + the top-k —
    no extra exchange of the chunk table."""
    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.pipelines import (
        build_chunk_index,
        indexed_chunked_search,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    idx = build_chunk_index(
        spark, docs, str(tmp_path / "chunks"),
        chunk_tokens=16, overlap=4, dim=32, k_centroids=4,
    )
    df = indexed_chunked_search(spark, idx, "vector search", k=5, nprobe=2, dim=32)
    assert A.uses_broadcast_join(df), A.plan_string(df)
    assert not A.plan_string(df).count("SortMergeJoin"), A.plan_string(df)
    # broadcast of the probe rows + the rollup agg + final sort; the chunk
    # table itself is never hash-exchanged
    assert A.count_exchanges(df) <= 3, A.plan_string(df)
    # r6: the indexed path keeps the SINGLE-PASS rollup on purpose — the
    # probe is pruned/small, and the packed-agg + fetch-back shape's
    # extra stages measured slower than the partial sort they remove
    # (see _maxsim_rollup's strategy note)


def test_chunked_search_rollup_hash_aggregates(spark, sf_dir):
    """The brute-force (full-corpus) chunk path hash-aggregates: the
    rollup's packed (score, -seq) long replaces the struct-ordered max_by
    that forced Sort + SortAggregate per partition (r5 watch item), and
    the winners' text fetch-back adds NO shuffle (2 total: the demo
    repartition + the agg exchange)."""
    from vector_search_databricks_poc_spark.queries_registry import QUERIES as Q

    df = Q["chunked_doc_search"](spark, sf_dir)
    plan = A.plan_string(df)
    assert "SortAggregate" not in plan, plan
    assert "HashAggregate" in plan, plan
    assert A.audit(df)["shuffles"] <= 2, plan


def test_sequence_packing_two_shuffles_pruned_scan(spark, sf_dir):
    """Packing = one window shuffle on pack_group (reused by the agg) + the
    final order; the scan reads only (doc_id, text)."""
    df = QUERIES["sequence_packing"](spark, sf_dir)
    assert set(A.read_schema_columns(df)) <= {"doc_id", "text"}, A.plan_string(df)
    assert A.count_exchanges(df) <= 2, A.plan_string(df)


def test_domain_mixture_broadcasts_feasible_n(spark, sf_dir):
    """The per-domain counts and feasible-N aggregates re-enter the plan as
    broadcast joins — no driver-side fetch."""
    df = QUERIES["domain_mixture"](spark, sf_dir)
    assert A.uses_broadcast_join(df), A.plan_string(df)


def test_cluster_dedup_broadcasts_seeds(spark, sf_dir):
    df = QUERIES["semantic_cluster_dedup"](spark, sf_dir)
    assert A.uses_broadcast_join(df), A.plan_string(df)


def test_skew_topkeys_take_ordered(spark, sf_dir):
    """Global top-N of key counts must be TakeOrderedAndProject, never a
    single-partition full sort of every distinct key."""
    df = QUERIES["skew_topkeys"](spark, sf_dir)
    assert A.uses_take_ordered(df), A.plan_string(df)


def test_zorder_layout_single_agg_shuffle(spark, sf_dir):
    """z-value arithmetic is map-side (stats broadcast into the plan); the
    data-path exchanges are the one-row stats agg + its broadcast + the
    bucket aggregate + the final order — nothing shuffles the table twice."""
    df = QUERIES["zorder_layout"](spark, sf_dir)
    assert A.uses_broadcast_join(df), A.plan_string(df)
    assert A.count_exchanges(df) <= 4, A.plan_string(df)
    assert set(A.read_schema_columns(df)) <= {"o_custkey", "o_totalprice"}


def test_minhash_signatures_shuffle_free(spark, sf_dir):
    """The signature formulation is a pure map: the ONLY exchange in
    the plan is the parallelism-guard round-robin repartition — no hash
    exchange, no aggregate (the per-doc mins run inside the row, in the
    vectorized-numpy mapInPandas stage since r5)."""
    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.operators.dedup import (
        minhash_signatures_df,
    )

    d = load_table(spark, sf_dir, "documents")
    plan = minhash_signatures_df(d)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
    assert "hashpartitioning" not in plan, plan
    assert "HashAggregate" not in plan and "SortAggregate" not in plan, plan


def test_media_probe_pruned_scan_chained_mapinpandas(spark, sf_dir):
    """media_metadata_probe: the scan reads ONLY doc_id with the <200
    filter pushed, and synth + featurize run as two CHAINED MapInPandas
    stages with no exchange between them — the corpus flows straight from
    the scan through both Arrow stages before the tiny per-container
    aggregate shuffles."""
    df = QUERIES["media_metadata_probe"](spark, sf_dir)
    assert A.has_pushed_filters(df), A.plan_string(df)
    assert A.read_schema_columns(df) == ["doc_id"], A.read_schema_columns(df)
    import re

    # simple-mode string: one line per operator (formatted mode repeats
    # each node in its detail section, which would double the counts)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 2, plan
    # no Exchange between the two MapInPandas nodes (they are adjacent in
    # the operator chain)
    between = re.search(r"MapInPandas.*MapInPandas", plan, re.S)
    assert between and "Exchange" not in between.group(0), plan


def test_bloom_decontamination_probe_filters_in_place(spark, sf_dir):
    """bloom_decontamination (operators/bloom.py): the corpus side must be
    FILTERED IN PLACE by the broadcast-bitmap probe — an ArrowEvalPython
    (vectorized pandas_udf) over the exploded n-gram stream feeding the
    verify semi-join, with the documents scan pruned to (doc_id, text) and
    no shuffle before the probe (candidates alone reach the join)."""
    df = QUERIES["bloom_decontamination"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan          # vectorized probe, not a row UDF
    assert "BatchEvalPython" not in plan, plan      # never row-at-a-time
    assert plan.count("LeftSemi") >= 1, plan        # exact verification join
    # every documents scan reads only the two needed columns
    import re

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = sorted(p.split(":")[0] for p in m.group(1).split(",") if p)
        assert cols == ["doc_id", "text"], plan


def test_repetition_signals_shuffle_free_pruned(spark, sf_dir):
    """The signal block is a per-row map: ZERO exchanges, and the scan
    reads only (doc_id, text)."""
    from vector_search_databricks_poc_spark.operators.text import repetition_signals

    df = repetition_signals(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    assert A.count_exchanges(df) == 0
    assert set(A.read_schema_columns(df)) <= {"doc_id", "text"}


def test_paragraph_dedup_shuffle_budget(spark, sf_dir):
    """Keeper agg + keeper join + per-doc rebuild + id-survival join: the
    hash-key exchanges must stay bounded (<= 5 with AQE reuse) and nothing
    may broadcast the corpus-sized keeper table."""
    from vector_search_databricks_poc_spark.operators.text import paragraph_dedup

    df = paragraph_dedup(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    assert A.count_exchanges(df) <= 5


def test_dsir_literal_scorer_shuffle_free_pruned(spark, sf_dir):
    """Frozen-fit DSIR scoring is a pure Arrow map: ZERO exchanges, scan
    pruned to (doc_id, text)."""
    from vector_search_databricks_poc_spark.operators.dsir import dsir_scores_literal

    df = dsir_scores_literal(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        [0.0] * 512,
    )
    assert A.count_exchanges(df) == 0
    assert set(A.read_schema_columns(df)) <= {"doc_id", "text"}


def test_dsir_select_plan_shape(spark, sf_dir):
    """One-plan fit+score+select: the B-row weight table and one-row
    totals broadcast (never sort-merge), selection is a
    TakeOrderedAndProject, and the corpus-sized shuffles stay bounded —
    2 bucket-count aggs, totals agg, per-doc score agg, plus AQE final
    exchanges (<= 6 observed), plus the under-parallelism guard's
    round-robin repartitions (fire on single-split fixture files, no-op
    at real input sizes).  The guard exchange appears at every STATIC
    reference to the guarded input (corpus: fit + score legs) but is ONE
    runtime exchange via ReusedExchange, so the static bound is 11, not
    6+2."""
    from vector_search_databricks_poc_spark.operators.dsir import dsir_select

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    df = dsir_select(
        d.select("doc_id", "text"),
        d.where(F.col("lang") == "fr").select("doc_id", "text"),
        n=40,
        buckets=512,
    )
    a = A.audit(df)
    assert a["take_ordered"], A.plan_string(df)
    assert a["broadcast_join"] and not a["sort_merge_join"], A.plan_string(df)
    assert a["shuffles"] <= 11, A.plan_string(df)


def test_semantic_dedup_seeded_plan_shape(spark, sf_dir):
    """Lazy seeded SemDeDup: the k*dim seed side broadcasts (never a
    corpus-sized sort-merge), and the shuffle budget stays bounded —
    assignment agg + per-id rank + assignment join + cluster grouping
    for the pruner (<= 6 with AQE reuse)."""
    from vector_search_databricks_poc_spark.operators.semdedup import semantic_dedup

    df = semantic_dedup(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        id_col="vec_id",
        eps=0.9,
        k_clusters=8,
    )
    a = A.audit(df)
    assert a["broadcast_join"], A.plan_string(df)
    assert a["shuffles"] <= 6, A.plan_string(df)
    assert set(A.read_schema_columns(df)) <= {"vec_id", "embedding"}


def test_pack_token_ids_two_shuffles(spark, sf_dir):
    """Packed-example emission: exactly the window exchange (per hash
    group) and the sequence-id aggregate exchange — no global sort, no
    extra repartition."""
    from vector_search_databricks_poc_spark.operators.dedup import portable_string_hash
    from vector_search_databricks_poc_spark.operators.packing import pack_token_ids

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ids = F.transform(
        F.filter(F.split(F.col("text"), " "), lambda t: t != ""),
        lambda t: F.pmod(portable_string_hash(t), F.lit(32000)).cast("int"),
    )
    df = pack_token_ids(d.select("doc_id", ids.alias("input_ids")),
                        budget=512, n_groups=8)
    assert A.count_exchanges(df) <= 2, A.plan_string(df)
    assert set(A.read_schema_columns(df)) <= {"doc_id", "text"}


def test_binary_search_plan_take_ordered_no_shuffle(spark, sf_dir):
    """Binary rung stage 1: the Hamming rank must plan as
    TakeOrderedAndProject over the single scan — no Exchange.  On the
    UNPACKED-corpus path the sign-pack + popcount runs as exactly ONE
    vectorized ArrowEvalPython (r10: the literal-mean when-tree cost
    seconds of Catalyst analysis per fresh plan — see binary_quant.
    _query_hamming_pandas); with a persisted ``bits_col`` the stage is
    pure codegen XOR/bit_count, no Python at all (the at-rest scale
    shape)."""
    from vector_search_databricks_poc_spark.operators.binary_quant import (
        binary_quantize_table, binary_search, mean_vector,
    )

    e = load_table(spark, sf_dir, "embeddings")
    mean = mean_vector(e)
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>")
    ).first()[0]
    df = binary_search(e, mean, list(q), k=10, over_fetch=10)
    s = A.plan_string(df)
    assert A.uses_take_ordered(df), s
    assert A.count_exchanges(df) == 0, s
    # count on the SIMPLE plan (formatted prints each node twice)
    assert A.plan_string(df, "simple").count("ArrowEvalPython") == 1, s
    assert "BatchEvalPython" not in s, s       # never row-at-a-time

    packed = binary_quantize_table(e, mean).localCheckpoint()
    df2 = binary_search(
        packed, mean, list(q), k=10, over_fetch=10, bits_col="bits"
    )
    s2 = A.plan_string(df2)
    assert A.uses_take_ordered(df2), s2
    assert A.count_exchanges(df2) == 0, s2
    assert "pythonUDF" not in s2 and "ArrowEval" not in s2, s2


def test_pca_search_plan_take_ordered_no_shuffle(spark, sf_dir):
    """PCA rung: reduced-space candidate rank and exact rerank both plan
    as TakeOrderedAndProject with zero exchanges; the projection matvec
    stays an expression (no Python)."""
    from vector_search_databricks_poc_spark.operators.pca import (
        fit_pca, pca_reduced_search,
    )

    e = load_table(spark, sf_dir, "embeddings")
    model = fit_pca(e, k=8)
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>")
    ).first()[0]
    df = pca_reduced_search(e, model, list(q), k=10, over_fetch=10)
    s = A.plan_string(df)
    assert A.uses_take_ordered(df), s
    assert A.count_exchanges(df) == 0, s
    assert "pythonUDF" not in s and "ArrowEval" not in s, s


def test_fuzzy_catalog_match_reads_only_needed_columns(spark, sf_dir):
    """Fuzzy catalog match: broadcast join on the deletion key (dirty
    side never shuffles before the pair dedup) and the part scan reads
    only (p_partkey, p_name)."""
    from vector_search_databricks_poc_spark import queries_registry as R

    df = R.QUERIES["fuzzy_catalog_match"](spark, sf_dir)
    s = A.plan_string(df)
    assert A.uses_broadcast_join(df), s
    # catalog min-agg exchange + pair-dedup exchange; TakeOrdered for the
    # final orderBy is absent (full result, ordered output) so allow the
    # sort exchange too
    assert A.count_exchanges(df) <= 3, s
    assert set(A.read_schema_columns(df)) <= {"p_partkey", "p_name"}, s
