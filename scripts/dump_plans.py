"""Regenerate PLANS.md: physical-plan evidence for headline operators."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import vector_search_databricks_poc_spark.queries_registry as R
from vector_search_databricks_poc_spark.plans import audit as A
from vector_search_databricks_poc_spark.queries_registry import QUERIES
from vector_search_databricks_poc_spark.session import get_spark

NAMES = [
    "topk_cosine_search",
    "scan_filter_project",
    "join_star_revenue",
    "batch_similarity_join",
    "pricing_summary",
    "global_topn",
    "shipping_priority",
    "rerank_two_stage",
    "hybrid_search",
    "minhash_near_dup_portable",
    "sequence_packing",
    "domain_mixture",
    "semantic_cluster_dedup",
    "heavy_hitters",
    "quantile_profile",
    "funnel_conversions",
    "cohort_retention",
    "validate_contract",
    "chunked_doc_search",
    "join_size_preflight",
    "media_metadata_probe",
    "bloom_decontamination",
    "repetition_signals_q",
    "paragraph_dedup",
    "url_blocklist_filter_q",
    "crawl_corpus",
    "dsir_selection",
    "semantic_dedup",
    "packed_sequences",
    "token_budget_mixture_q",
    "manifest_pruned_scan",
    "filtered_vector_search",
    "exact_substring_dedup",
    "graph_exact_search",
    "batch_search_endpoint",
    "fuzzy_catalog_match",
    "binary_quant_search",
    "pca_reduced_search",
    "incremental_agg_view",
    "batch_endpoint_brute",
    "maxsim_search",
    "maxsim_search_pruned",
]

HEADER = """# PLANS — physical-plan evidence for the headline operators

Generated from `.explain("formatted")` plus the `plans.audit` summary at
sf0.01 (plan shape is scale-invariant: the same strategies apply at 100 TB
with more partitions). Regenerate with `python scripts/dump_plans.py`.
Plan-shape invariants are enforced in `tests/test_plans.py`.

What to look for:
- `PushedFilters: [...]` non-empty and `ReadSchema` pruned on every scan;
- dims/query sides behind `BroadcastExchange` (no fact-side shuffle);
- `TakeOrderedAndProject` for every top-k (no global Sort);
- `shuffles` (Exchange count minus broadcasts) small and justified.
"""


def main() -> None:
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    lines = [HEADER]
    for n in NAMES:
        # consolidated r6 slots keep their legs as module functions
        df = (QUERIES.get(n) or getattr(R, n))(spark, sf)
        lines.append(f"## {n}\n")
        lines.append(f"Audit: `{A.audit(df)}`\n")
        lines.append("```")
        lines.append(A.plan_string(df, "formatted")[:4000].rstrip())
        lines.append("```\n")
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(lines)
    )
    print("PLANS.md written")


if __name__ == "__main__":
    main()
