"""Regression: declared query builders must construct ONE lazy plan.

VERDICT r1 flagged driver-side actions (.first()/.collect()/.count())
inside `queries()` builders — an anti-pattern because every declared
query should hand the driver a plan, not run jobs of its own.  This
test patches every DataFrame action method to raise, then calls every
builder.  Builders whose *contract* is eager (index build = CREATE
INDEX analog; streaming queries that must run a stream to produce a
batch-readable result) are allowlisted explicitly so any new eager
builder fails loudly.
"""

import pytest

import __spark_entry__ as E
from tests.conftest import SF_DIR

# Builders whose contract requires actions during build:
#  - ivf_*: KMeans fit + index-table write (CREATE INDEX analog)
#  - incremental_index_refresh / streaming_index_sync: run a refresh job
#    and report its effect
#  - streaming_* / stateful_user_stats: execute a Structured Streaming
#    query into a memory sink, then return the sink table
#  - near_dup_pairs_components: iterative label propagation — the
#    driver-side convergence loop (count per round) IS the algorithm
EAGER_BY_CONTRACT = {
    "ivf_index_search",
    "graph_exact_search",  # graph build + beam hop loop + driver-side
    #   query-vector fetch (the exact-rescore projection itself is lazy)
    "graph_index_search",  # graph build (CREATE INDEX analog) + beam-search
    #   driver loop (like near_dup_pairs_components: per-hop convergence
    #   count IS the algorithm)
    "graph_batch_search",  # same beam driver loop, batch shape
    "graph_incremental_insert",  # graph build + search-based insert rewrite
    "graph_delete_repair",  # graph build + delete rewrite with local repair
    "similarity_search_endpoint",  # index build + driver-side query embed
    #   (the reference embeds query text on the driver too)
    "ivf_batch_search",
    "ivf_pq_batch_search",
    "incremental_index_refresh",
    "incremental_near_dup",  # signature-store write (CREATE INDEX analog)
    "ann_recall_report",  # builds two indexes (CREATE INDEX analog)
    "hard_negative_mining",  # index build (CREATE INDEX analog)
    "streaming_index_sync",
    "bloom_decontamination",  # Bloom bitmap build over the benchmark side
    #   (CREATE INDEX analog, like the IVF KMeans fit)
    "change_log_replay",  # CDC round trip: index builds + log replay stream
    "index_rebalance",  # index builds + imbalance probe + rebalance rewrite
    "index_compaction",  # index build + appends + file-count probe + compaction
    "indexed_chunk_search",  # chunk-index build (CREATE INDEX analog)
    "wet_crawl_ingest",  # WET shard export (CREATE INDEX analog)
    "bpe_tokenize",  # tokenizer training fit (KMeans analog: collects the
    #   capped word-count table; encoding + summary stay lazy)
    "quality_classifier",  # LogisticRegression fit (training job); scoring
    #   is a shuffle-free map
    "lm_perplexity",  # n-gram LM count fit (training job); scoring is a
    #   shuffle-free map
    "streaming_tumbling",
    "streaming_dedup",
    "streaming_near_dup_gate",  # two availableNow stream runs + census

    "streaming_funnel",
    "manifest_pruned_scan",  # zorder_write + write_manifest (CREATE INDEX
    #   analog) + the driver-side manifest read that IS the pruning step
    "bloom_point_lookup",  # bloom build scan (CREATE INDEX analog) + the
    #   driver-side bloom verdict read that IS the pruning step
    "stateful_user_stats",
    "near_dup_pairs_components",
    "quality_dedup_keepers",  # same iterative label propagation
    "fuzzy_name_dedup",  # same iterative label propagation (fuzzy_dedup)
    "pagerank_centrality",  # power-iteration checkpoints + label propagation
    "pca_reduced_search",  # PCA sufficient-stats fit (CREATE INDEX analog)
    "binary_quant_search",  # mean-vector fit (CREATE INDEX analog)
    "embedding_drift_psi",  # PCA fit frozen on the reference snapshot
    "streaming_agg_view",  # bootstrap writes + availableNow stream run
}

ACTIONS = [
    "collect",
    "first",
    "count",
    "head",
    "take",
    "tail",
    "toPandas",
    "toLocalIterator",
    "foreach",
    "foreachPartition",
]


class _ActionFired(Exception):
    pass


@pytest.fixture()
def forbid_actions(spark, monkeypatch):
    cls = type(spark.range(1))  # the concrete (classic) DataFrame class

    def _raiser(name):
        def _fail(self, *a, **k):
            raise _ActionFired(f"DataFrame.{name}() fired during query build")

        return _fail

    for name in ACTIONS:
        monkeypatch.setattr(cls, name, _raiser(name))
    yield


def test_declared_queries_build_lazily(spark, forbid_actions):
    lazy = {k: v for k, v in E.queries().items() if k not in EAGER_BY_CONTRACT}
    fired = {}
    for name, fn in lazy.items():
        try:
            df = fn(spark, SF_DIR)
        except _ActionFired as ex:
            fired[name] = str(ex)
        else:
            assert df is not None
    assert not fired, f"builders ran driver-side actions: {fired}"


def test_allowlist_is_tight(spark):
    """Every allowlisted name must still be a declared query — stale
    entries would silently shrink the lazy check's coverage."""
    assert EAGER_BY_CONTRACT <= set(E.queries())


def test_search_pipeline_builds_lazily(spark, tmp_path, monkeypatch):
    """VERDICT r2 #2: the user-facing §3.2 pipeline helper must hand back a
    plan — the query embedding enters via batch_search's in-plan expressions,
    never a driver-side .first() fetch."""
    from pyspark.sql import functions as F

    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.pipelines import (
        build_index_pipeline,
        search_pipeline,
    )

    docs = load_table(spark, SF_DIR, "documents").where(F.col("doc_id") < 200)
    idx = build_index_pipeline(docs, str(tmp_path / "idx"), k_centroids=4, dim=32)

    cls = type(spark.range(1))
    for name in ACTIONS:
        def _fail(self, *a, _n=name, **k):
            raise _ActionFired(f"DataFrame.{_n}() fired during search_pipeline")

        monkeypatch.setattr(cls, name, _fail)
    df = search_pipeline(spark, idx, docs, "vector join data", k=3, nprobe=2, dim=32)
    assert df is not None and "context" in df.columns
