"""Mergeable sketch profiling: per-shard HyperLogLog sketches, unioned
incrementally.

Exact COUNT(DISTINCT) over 100 TB is a full shuffle of every distinct
value; the sketch pattern replaces it with a scan that emits one ~KB HLL
sketch per shard, unioned in O(shards) — and because HLL merge is
commutative/associative/idempotent, the per-shard sketches can be
PERSISTED next to the data and re-unioned whenever new shards land,
giving incremental cardinality profiles without ever re-reading old data
(Datasketches HLL via Spark's hll_sketch_agg/hll_union_agg builtins;
deterministic for a given input multiset).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def shard_sketches(
    df: DataFrame, shard_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch of ``value_col`` per shard — the persistable profile
    artifact (binary ``sketch`` column + exact per-shard row count)."""
    return df.groupBy(shard_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.count(value_col).alias("n_rows"),
    )


def union_estimate(sketches: DataFrame) -> DataFrame:
    """Union per-shard sketches into the global cardinality estimate.
    O(shards) rows in, one row out — no touch of the base data."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate"),
        F.sum("n_rows").alias("n_rows"),
    )


def sketch_profile(
    df: DataFrame, cols: list[str], shard_col: str, lg_k: int = 12
) -> DataFrame:
    """Cardinality profile of ``cols``: exact distinct vs the
    shard-sketch-union estimate and its relative error — the accuracy
    audit run at small scale before trusting sketches at 100 TB."""
    legs = []
    for c in cols:
        est = union_estimate(shard_sketches(df, shard_col, c, lg_k)).select(
            F.lit(c).alias("col"),
            F.col("estimate"),
            F.col("n_rows"),
        )
        exact = df.agg(F.count_distinct(F.col(c)).alias("exact"))
        legs.append(est.join(F.broadcast(exact)))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.select(
        "col",
        "exact",
        "estimate",
        F.round((F.col("estimate") - F.col("exact")) / F.col("exact"), 4).alias(
            "rel_err"
        ),
        "n_rows",
    )


def shard_histograms(
    df: DataFrame,
    shard_col: str,
    value_col: str,
    bins: int = 64,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Per-shard fixed-bin histogram of ``value_col`` — the mergeable
    distribution artifact (≤ ``bins`` rows per shard: bucket, count, and
    the [lo, hi] the binning was defined over).

    Histograms merge by bucket-count addition ONLY when built over the same
    [lo, hi]: pass explicit ``bounds`` for persisted incremental profiles
    (new shards histogrammed later with the pinned bounds merge exactly —
    same contract as the HLL sketches above, for quantiles instead of
    cardinality; values outside pinned bounds clamp into the edge bins).
    With ``bounds=None`` the global min/max is computed once in-plan and
    rides along as a broadcast one-row cross join — still one lazy plan.
    Null and NaN values are excluded; all-equal values degenerate to
    bucket 0.  The bin count rides along in a ``bins`` column so that
    ``histogram_quantiles`` derives the bin width from the histogram
    itself — callers can never skew estimates by re-supplying a different
    bin count downstream.
    """
    v = F.col(value_col).cast("double")
    if bounds is not None:
        lo, hi = float(bounds[0]), float(bounds[1])
        bnd = df.sparkSession.range(1).select(
            F.lit(lo).alias("_lo"), F.lit(hi).alias("_hi")
        )
    else:
        bnd = df.agg(F.min(v).alias("_lo"), F.max(v).alias("_hi"))
    bounds_df = bnd
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    bucket = (
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(F.lit(bins - 1), F.floor((v - F.col("_lo")) / width)),
            )
        )
        .cast("int")
    )
    return (
        df.join(F.broadcast(bounds_df))
        .where(v.isNotNull() & ~F.isnan(v))
        .groupBy(F.col(shard_col), bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.first("_lo").alias("lo"),
            F.first("_hi").alias("hi"),
            F.first(F.lit(bins)).alias("bins"),
        )
    )


def histogram_quantiles(hist: DataFrame, probs: tuple[float, ...]) -> DataFrame:
    """Quantile estimates from merged shard histograms: (p, estimate).

    Merges bucket counts across shards (one tiny shuffle over ≤ bins keys),
    runs a cumulative sum over the ≤ bins merged rows (single-partition
    window — over histogram rows, never data rows), then linearly
    interpolates each requested quantile inside its bucket.  Worst-case
    error is one bin width; the base data is never touched.  The bin width
    is derived from the histogram's own ``bins`` column (written by
    ``shard_histograms``) — there is no separate bin-count argument to get
    out of sync.
    """
    from pyspark.sql import Window

    merged = hist.groupBy("bucket").agg(
        F.sum("cnt").alias("cnt"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.first("bins").alias("bins"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "bucket",
        "cnt",
        "lo",
        "hi",
        "bins",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
    )
    spark = hist.sparkSession
    probs_df = spark.createDataFrame([(float(p),) for p in probs], "p double")
    total = hist.agg(F.sum("cnt").alias("_n"))
    targets = probs_df.crossJoin(F.broadcast(total)).select(
        "p", (F.col("p") * F.col("_n")).alias("target")
    )
    width = (F.col("hi") - F.col("lo")) / F.col("bins").cast("double")
    frac = F.greatest(
        F.lit(0.0),
        F.least(F.lit(1.0), (F.col("target") - F.col("cum_prev")) / F.col("cnt")),
    )
    est = F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
        F.col("lo") + width * (F.col("bucket") + frac)
    )
    picked = (
        targets.join(F.broadcast(cum), F.col("cum") >= F.col("target"))
        .groupBy("p")
        .agg(
            F.min_by(
                F.struct("bucket", "cnt", "cum_prev", "lo", "hi", "bins"), "bucket"
            ).alias("_s"),
            F.first("target").alias("target"),
        )
        .select("p", "target", "_s.*")
    )
    return picked.select("p", est.alias("estimate")).orderBy("p")


def quantile_profile(
    df: DataFrame,
    value_col: str,
    shard_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    bins: int = 128,
) -> DataFrame:
    """Accuracy audit for the histogram-quantile pattern: estimate vs the
    exact percentile, with the bin-width error bound alongside — run at
    small scale before trusting merged histograms at 100 TB."""
    hist = shard_histograms(df, shard_col, value_col, bins)
    est = histogram_quantiles(hist, probs)
    v = F.col(value_col).cast("double")
    exact = df.agg(
        *[
            F.percentile(v, F.lit(float(p))).alias(f"_x{i}")
            for i, p in enumerate(probs)
        ],
        ((F.max(v) - F.min(v)) / F.lit(float(bins))).alias("bin_width"),
    )
    exact_rows = exact.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(p)).alias("p"), F.col(f"_x{i}").alias("exact")
                    )
                    for i, p in enumerate(probs)
                ]
            )
        ).alias("e"),
        "bin_width",
    ).select("e.p", "e.exact", "bin_width")
    return (
        est.join(exact_rows, "p")
        .select(
            "p",
            F.round("estimate", 4).alias("estimate"),
            F.round("exact", 4).alias("exact"),
            F.round(F.abs(F.col("estimate") - F.col("exact")), 4).alias("abs_err"),
            F.round("bin_width", 4).alias("bin_width"),
        )
        .orderBy("p")
    )


def distribution_drift(
    old_df: DataFrame,
    new_df: DataFrame,
    value_col: str,
    bins: int = 64,
) -> DataFrame:
    """Distribution drift of ``value_col`` between two corpus snapshots:
    one row (n_old, n_new, tv_distance) where tv_distance is the total
    variation distance between the two fixed-bin histograms (0 = identical
    binned distributions, 1 = disjoint support).

    Both sides are histogrammed over SHARED bounds (computed in-plan over
    the union, so the buckets align by construction), then TV =
    ½ · Σ|p_b − q_b| over ≤ bins merged rows.  The run-before-retraining
    check "did the new crawl shift the data?" — cost is one scan of each
    side plus sketch-sized reductions.
    """
    tagged = old_df.select(
        F.col(value_col), F.lit("old").alias("_side")
    ).unionByName(new_df.select(F.col(value_col), F.lit("new").alias("_side")))
    hist = shard_histograms(tagged, "_side", value_col, bins)
    sides = hist.groupBy("bucket").pivot("_side", ["old", "new"]).agg(
        F.first("cnt")
    )
    totals = hist.groupBy().pivot("_side", ["old", "new"]).agg(F.sum("cnt"))
    n_old, n_new = F.col("_n_old"), F.col("_n_new")
    p = F.coalesce(F.col("old"), F.lit(0)) / n_old
    q = F.coalesce(F.col("new"), F.lit(0)) / n_new
    return (
        sides.join(
            F.broadcast(
                totals.select(
                    F.col("old").alias("_n_old"), F.col("new").alias("_n_new")
                )
            )
        )
        .agg(
            F.first(n_old).alias("n_old"),
            F.first(n_new).alias("n_new"),
            F.round(F.sum(F.abs(p - q)) / 2, 6).alias("tv_distance"),
        )
    )


def frequent_item_candidates(
    df: DataFrame, key_col: str, counters: int = 256
) -> DataFrame:
    """Per-partition Misra–Gries summaries: candidate frequent keys with
    lower-bound counts, ≤ ``counters`` rows per partition.

    The summary is built batch-at-a-time with vectorized pandas ops
    (``value_counts`` + the mergeable-summaries reduction: subtract the
    (k+1)-th largest counter, keep positives — Agarwal et al., "Mergeable
    Summaries", PODS 2012), never a per-row Python loop.  Guarantee: every
    key whose count within a partition exceeds n_part/(counters+1) survives
    that partition's summary, so the union over partitions is a superset of
    all keys with global frequency > n/(counters+1).  Null keys are not
    counted as items.
    """
    key_field = df.schema[key_col]
    out_schema = T.StructType(
        [key_field, T.StructField("lb", T.LongType(), nullable=False)]
    )

    def mg(batches):
        import pandas as pd

        s = None
        for pdf in batches:
            vc = pdf[key_col].value_counts(dropna=True)
            s = vc if s is None else s.add(vc, fill_value=0)
            if len(s) > counters:
                kth = s.nlargest(counters + 1).iloc[-1]
                s = s[s > kth] - kth
        if s is None or s.empty:
            return
        yield pd.DataFrame({key_col: s.index, "lb": s.to_numpy().astype("int64")})

    return df.select(key_col).mapInPandas(mg, schema=out_schema)


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold_frac: float = 0.01,
    counters: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters (keys with frequency ≥ threshold_frac · n) via the
    2-pass candidate/recount pattern.

    Pass 1 scans once and emits ≤ counters keys per partition (Misra–Gries,
    no shuffle).  Pass 2 recounts ONLY candidate keys: the broadcast
    left-semi join filters rows map-side, so the groupBy's partial-aggregate
    hash tables and the shuffle carry candidate keys instead of the full key
    domain — at 100 TB with a high-cardinality key that is the difference
    between shuffling |candidates| ≈ counters × partitions entries and
    shuffling every distinct key.  ``counters`` is raised to
    ceil(1/threshold_frac) when smaller so the candidate set provably
    contains every true heavy hitter, making the result exact and
    SQL-oracle-checkable (GROUP BY … HAVING count ≥ ceil(f · n)).

    The total row count rides along as a broadcast one-row cross join — the
    whole operator is one lazy plan, no driver-side action.
    """
    k = max(int(math.ceil(1.0 / threshold_frac)), 1)
    counters = max(counters or 0, k)
    cands = frequent_item_candidates(df, key_col, counters).select(key_col).distinct()
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    counted = (
        df.join(F.broadcast(cands), on=key_col, how="left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.join(F.broadcast(total))
        .where(
            F.col("cnt")
            >= F.ceil(F.col("_n") * F.lit(float(threshold_frac))).cast("long")
        )
        .select(key_col, "cnt")
        .orderBy(F.col("cnt").desc(), F.col(key_col))
    )


def relative_heavy_hitters(
    df: DataFrame,
    key_col: str,
    mean_mult: float = 1.2,
    counters: int = 2048,
) -> DataFrame:
    """EXACT hot keys relative to the key distribution's own mean: keys
    with frequency ≥ ``mean_mult`` × (n / distinct_keys).

    A fixed frequency-fraction threshold (``heavy_hitters``) stops being
    meaningful when the key domain grows with the data — at 10× the rows
    and 10× the keys, every per-key fraction drops 10× and a constant
    threshold returns nothing.  Anchoring the threshold to the MEAN key
    frequency makes the qualifying set depend on the SHAPE of the
    distribution, not the row count, so the same query finds skew at
    sf0.001 and at 100 TB.

    Same 2-pass candidate/recount plan as ``heavy_hitters`` (Misra–Gries
    per partition, broadcast-semi recount of candidates only); the (n,
    distinct) statistics ride along as a broadcast one-row join — one lazy
    plan.  Exact whenever ``counters`` + 1 > distinct_keys / ``mean_mult``
    (every qualifying key has count ≥ mean_mult·n/d > n/(counters+1), so
    it provably survives the candidate pass); the distinct count is the
    exact ``count_distinct`` — a shuffle of bare key values, acceptable
    for a profiling pass and swappable for ``approx_count_distinct`` when
    even that is too much.
    """
    cands = frequent_item_candidates(df, key_col, counters).select(key_col).distinct()
    stats = df.agg(
        # F.count(col) excludes nulls — consistent with the candidate and
        # recount passes, which join on the key and so never see null keys;
        # F.count(lit(1)) would inflate the mean threshold on nully columns
        F.count(F.col(key_col)).alias("_n"),
        F.count_distinct(F.col(key_col)).alias("_d"),
    )
    counted = (
        df.join(F.broadcast(cands), on=key_col, how="left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Exactness guard, evaluated IN the plan (the builder is lazy, so the
    # check can't run on the driver): Misra–Gries with k counters only
    # guarantees candidates for keys with count > n/(k+1); the mean-based
    # threshold mean_mult·n/d clears that bound iff d ≤ mean_mult·(k+1).
    # Beyond it the result could silently drop qualifying keys — fail
    # loudly instead and tell the caller to raise `counters`.
    bound = float(mean_mult) * (counters + 1)
    thresh = F.when(
        F.col("_d") > F.lit(bound),
        F.raise_error(
            F.concat(
                F.lit("relative_heavy_hitters: "),
                F.col("_d").cast("string"),
                F.lit(
                    f" distinct keys exceed the exactness bound "
                    f"mean_mult*(counters+1)={bound:.0f}; raise counters "
                    f"(>= distinct/mean_mult) for an exact result"
                ),
            )
        ).cast("double"),
    ).otherwise(F.col("_n") / F.col("_d") * F.lit(float(mean_mult)))
    return (
        counted.join(F.broadcast(stats))
        .where(F.col("cnt") >= thresh)
        .select(key_col, "cnt")
        .orderBy(F.col("cnt").desc(), F.col(key_col))
    )
