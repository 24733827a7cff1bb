"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_queries_total", "value": <sum sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is materialized via a count-ish action (collect for small
results) so the full plan executes; times exclude session startup (reported
separately in "startup_sec").

Variance control (round-3 verdict): sub-second queries are overhead-bound
and can drift ±30% on a noisy host with unchanged plans, so they get
best-of-5 instead of best-of-3, and every query is compared against its
recorded all-time floor (BENCH_FLOORS.json).  A query >20% above its floor
is listed in "drift_flags" — plan regression OR host noise, either way
worth a look; a query that beats its floor ratchets the floor file down so
the signal tightens over rounds.

Host calibration (round 4): floors recorded on one incarnation of the VM
are meaningless on a slower one — a reboot onto different hardware made
ALL 20 queries read "+45% drift" with unchanged plans.  So the bench
times a fixed calibration job (a small Spark range-hash aggregate: JVM +
scheduler + CPU, the same overheads the sub-second queries measure) and
stores its floor next to the query floors; the drift threshold scales by
current_calibration / floor_calibration, making flags mean "this query
drifted MORE THAN THE HOST did".  Raw floors still only ratchet downward.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_search_databricks_poc_spark import queries_registry as R
from vector_search_databricks_poc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship + one representative per operator family.
HEADLINE = [
    "topk_cosine_search",       # B7 flagship
    "batch_similarity_join",    # B8
    "rerank_two_stage",         # B11
    "embedding_near_dup",       # B10 exact cosine pairs
    "minhash_near_dup",         # B10 minhash+LSH
    "exact_dedup_keeper",       # B9
    "join_star_revenue",        # B14
    "shipping_priority",        # B14/B17 (TPC-H Q3 shape)
    "local_supplier_volume",    # B14 (TPC-H Q5 shape)
    "pricing_summary",          # B15
    "window_rank_topn_per_group",  # B16
    "term_frequencies",         # B12
    "tumbling_window",          # B20
    "hashing_embed",            # B5
    "hybrid_search",            # BM25 + vector RRF
    "asof_join_events_orders",  # B14 as-of (union+window custom op)
    "ivf_pq_batch_search",      # A9/B8 IVF-PQ codes-only batch ADC
    "heavy_hitters",            # r3 sketch family: MG candidates + exact recount
    "funnel_conversions",       # r3 event analytics: ordered funnel
    "media_metadata_probe",     # r4 B13: header-only media probe via mapInPandas
    "indexed_chunk_search",     # r5 B7/B12: chunk-index probe + MaxSim rollup
    #   (first call builds+caches the chunk index; timed reps measure the
    #   probe + rollup, same treatment as ivf_pq_batch_search)
    "crawl_corpus",             # r6: crawl front half end-to-end — WET decode
    #   -> gate -> clean -> dedup -> near-dup -> split (first call exports
    #   the WET shards once; timed reps measure the pipeline)
    "graph_batch_search",       # r6 A9/B8: graph-ANN beam search, 16-query
    #   batch (first call builds+caches the k-NN graph; timed reps measure
    #   the amortized beam — the driver-loop hop depth is the serial cost,
    #   so per-query time is the batch divided by 16, the shape that
    #   matters at scale).  Floor re-seeded 3.486 -> 3.887 in r9 (and
    #   already ratcheted back down by faster runs since): the r8
    #   anchored prune (_prune_keep_in) keeps each node's best in-edge
    #   through the degree cut, so the graph is better connected and
    #   beams exact-score more neighbors per hop — measured +20% search
    #   time for recall@10 0.925 -> 0.931 and stranded nodes -> 0
    #   (scripts/graph_anchor_ab.py A/B at sf0.1; a deliberate
    #   recall-for-time trade, not a plan regression)
    "filtered_vector_search",   # r6 B7: similarity_search filters= knob —
    #   predicate pushed to the scan, zero shuffles, TakeOrdered ranking
    "manifest_pruned_scan",     # r6 layout: manifest-pruned file-skipping box
    #   query (first call z-orders orders + persists the stats manifest;
    #   timed reps measure prune + surviving-file scan)
    "batch_search_endpoint",    # r7 A10 batch serving shape: 16 query texts
    #   embedded in-plan + one exact broadcast-join plan with payload and
    #   per-query dense ranks (the loop-free rendition of the reference
    #   client's per-query endpoint calls)
    "fuzzy_catalog_match",      # r7 entity resolution: deletion-neighborhood
    #   blocking (codegen HOF explode) + broadcast catalog join + threshold
    #   levenshtein verify
    "binary_quant_search",      # r7 compression ladder: sign-bit packing,
    #   xor/bit_count Hamming TakeOrdered prefilter, exact cosine rerank
    #   (mean fit re-runs per rep — one corpus-sized agg, part of the op)
    "incremental_agg_view",     # r7 materialized-view maintenance: delta
    #   refresh of the per-status rollup from a snapshot diff — reads only
    #   the churned rows
    "streaming_agg_view",       # r8: the maintenance loop's streaming twin —
    #   bootstrap + change-feed drain through foreachBatch (measures the
    #   whole micro-batch cycle incl. checkpoint I/O, the cost the batch
    #   incremental_agg_view entry does not see)
    "maxsim_search",            # r8 B7b multi-vector late-interaction: exact
    #   MaxSim top-10 over Arrow-built token vectors (one scan +
    #   TakeOrdered; a regression to the expression-built construction
    #   would surface here as ~+110s of fixed Catalyst resolution)
    "maxsim_search_pruned",     # r8 B7b scale path: stage-1 per-query-token
    #   top-m (salted two-level windows) + candidate-only exact rerank —
    #   the retrieve-then-rerank cost shape.  Floor re-seeded 1.167 ->
    #   1.74 in r10: the r9 floor was recorded with an ACCIDENTAL
    #   cross-rep cache (each rep's fresh persist() registered an
    #   identical analyzed plan and the CacheManager swapped rep 1's
    #   materialized encode into reps 2+), which the optimization-round
    #   rules forbid; every rep now pays the Arrow encode through a
    #   fresh lazy localCheckpoint, and 1.74 is the measured honest
    #   best after the r10 stage-1 array-aggregate rewrite (the
    #   cache-free r9 shape measured 2.14)
]


def main() -> None:
    t0 = time.time()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    startup = time.time() - t0

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    # Untimed warmup: spin up executors, codegen, parquet footer caches —
    # measured times then reflect the queries, not first-job JVM warmup.
    t = time.time()
    R.global_topn(spark, SF_DIR).count()
    warmup = time.time() - t

    # calibration: fixed CPU+JVM+scheduler workload, best-of-5 (first rep
    # after the warmup query, so codegen/JIT noise lands in rep 1 and the
    # min reflects steady state)
    calib = None
    for _ in range(5):
        t = time.time()
        # shiftright keeps the ANSI-mode sum inside a long (5M × <2^32)
        spark.range(5_000_000).selectExpr(
            "sum(shiftright(xxhash64(id), 32)) s"
        ).collect()
        calib = min(calib or 1e9, time.time() - t)

    floors_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_FLOORS.json")
    # floors are only comparable within one (scale factor, core count)
    # environment — one run at a different sf would otherwise ratchet every
    # floor to nonsense and flag all queries as drifted forever after
    env_key = f"sf{sf}@cpus{spark.sparkContext.defaultParallelism}"
    try:
        with open(floors_path) as f:
            all_floors: dict = json.load(f)
    except (OSError, ValueError):
        all_floors = {}
    if all_floors and not any(isinstance(v, dict) for v in all_floors.values()):
        # migrate the pre-r4 flat layout (recorded at the default env)
        all_floors = {"sf0.1@cpus32": all_floors}
    floors: dict[str, float] = dict(all_floors.get(env_key, {}))

    # host-speed factor: >1 = this incarnation of the VM is slower than
    # the one the floors were recorded on; drift thresholds scale with it
    calib_floor = floors.get("_calibration_sec")
    speed = (calib / calib_floor) if calib_floor else 1.0
    if calib_floor is None or calib < calib_floor:
        floors["_calibration_sec"] = round(calib, 4)

    times: dict[str, float] = {}
    ratios: dict[str, float | None] = {}
    for name in HEADLINE:
        # some r1 headline queries were consolidated into merged declared
        # queries; the original callables remain as module functions so the
        # bench keeps per-operator names stable for regression tracking
        fn = R.QUERIES.get(name) or getattr(R, name)
        floor = floors.get(name)
        best, n, reps = None, 0, 0
        # best-of-3, extended to best-of-5 for overhead-bound queries
        # where scheduler noise dominates the signal — and for any query
        # currently >20% above its floor, so a drift flag is only raised
        # after the extra reps failed to close the gap.  A short query
        # STILL above its threshold after 5 gets up to 8: at these rep
        # costs the measurement is mostly scheduler jitter, and a flag
        # that three further reps couldn't clear is then a real signal
        # rather than one unlucky draw (r6 shipped 5 such flags that a
        # re-run cleared).  The "overhead-bound" band is <= 1.5s, not
        # < 1.0s (r9: topk_cosine_search sat at ~1.0-1.2s, just outside
        # the old band, and drew the round's only flag on jitter that a
        # solo rerun cleared — any query within ~2x of a second is still
        # jitter-dominated at ~0.2s scheduler noise per run).
        # rep-extension threshold: CPU-calibration-scaled only (the final
        # flag threshold below also folds in the suite median, but that
        # isn't known mid-loop — erring toward extra cheap reps here)
        margin = 1.2 * max(speed, 1.0)
        jittery = 1.5  # seconds: below this, noise can fake a 20% drift
        while reps < 3 or (
            best is not None
            and reps < 5
            and (best < jittery or (floor is not None and best > floor * margin))
        ) or (
            best is not None
            and reps < 8
            and best < jittery
            and floor is not None
            and best > floor * margin
        ):
            t = time.time()
            n = fn(spark, SF_DIR).count()
            el = time.time() - t
            best = el if best is None else min(best, el)
            reps += 1
        times[name] = round(best, 3)
        ratios[name] = (best / floor) if floor else None
        if floor is None or best < floor:
            floors[name] = times[name]
        print(f"# {name}: {times[name]}s ({n} rows, best of {reps})", file=sys.stderr)

    try:  # ratchet the floor file down so next round's signal is tighter
        all_floors[env_key] = floors
        with open(floors_path, "w") as f:
            json.dump(all_floors, f, indent=1, sort_keys=True)
    except OSError:
        pass

    # Flags are computed AFTER the suite, against the suite's own median
    # time/floor ratio as well as the CPU calibration: a plan regression
    # is per-query, so it shows as an OUTLIER above whatever inflation the
    # whole suite shares (r7: a VM reboot landed on hardware where the
    # CPU calibration reads 1.7x but scan/memory-bound queries run up to
    # 2.4x their floors — a CPU-only factor under-adjusts non-uniformly
    # slower hosts and manufactures phantom flags).  The median is capped
    # so a hypothetical everything-regressed code change can't silently
    # raise the bar without bound, and suite-wide inflation is surfaced
    # in drift_note + suite_inflation instead of per-query flags.
    known = sorted(r for r in ratios.values() if r is not None)
    med_ratio = known[len(known) // 2] if known else 1.0
    margin = 1.2 * max(speed, min(med_ratio, 3.0), 1.0)
    drift_flags = {}
    for name, r in ratios.items():
        if r is not None and r > margin:
            drift_flags[name] = (
                f"{times[name]}s vs floor {floors[name]}s "
                f"(+{(r - 1) * 100:.0f}%, host-adjusted "
                f"threshold +{(margin - 1) * 100:.0f}%)"
            )

    # many queries drifting TOGETHER is a loaded host, not a plan
    # regression — plans change one query at a time; annotate so a reader
    # of one noisy run doesn't chase 8 phantom regressions
    drift_note = None
    if len(drift_flags) >= max(3, len(times) // 3):
        drift_note = (
            f"{len(drift_flags)}/{len(times)} queries above the "
            f"host-adjusted drift threshold (+{(margin - 1) * 100:.0f}%) "
            "simultaneously - global host slowdown, not per-query regressions"
        )
    elif med_ratio > 1.35:
        drift_note = (
            f"suite-wide inflation: median time/floor {med_ratio:.2f}x "
            f"(cpu calibration {speed:.2f}x) - floors were recorded on a "
            "faster host incarnation; flags above are outliers beyond "
            "that shared inflation"
        )

    # key order matters: the driver archives only the LAST 4096 bytes of
    # stdout, so the per-query times (the most diagnostic numbers) print
    # LAST — with queries-first ordering the head queries' times were
    # truncated out of BENCH_r07/r08 (r8 verdict #5).  The floors dict is
    # NOT printed: it duplicates the committed BENCH_FLOORS.json byte for
    # byte, and carrying it pushed drift_flags/host_speed_factor past the
    # tail cap in BENCH_r09 (r9 verdict #3) — without it the whole object
    # fits the cap with room to spare.
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "startup_sec": round(startup, 3),
        "warmup_sec": round(warmup, 3),
        "calibration_sec": round(calib, 4),
        "host_speed_factor": round(speed, 3),
        "suite_inflation": round(med_ratio, 3),
        "drift_flags": drift_flags,
        "drift_note": drift_note,
        "queries": times,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
