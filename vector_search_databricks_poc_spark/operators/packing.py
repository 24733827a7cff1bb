"""Corpus-assembly operators: sequence packing, domain mixing, sharding,
and coarse semantic (cluster) dedup.

The last mile of a training-data pipeline — after cleaning and dedup the
corpus must be packed into fixed-token-budget training sequences, resampled
to a target domain mixture, and written as evenly sized shards.  The
reference delegates corpus assembly to managed jobs; here each step is a
deterministic, engine-portable DataFrame op (pure integer/window arithmetic,
no RNG), so the same row lands in the same pack/shard on every run, every
cluster size, and in the DuckDB oracle.

Scale notes (100 TB):
- ``pack_sequences`` packs independently inside ``n_groups`` hash buckets, so
  the window sort never sees more than corpus/n_groups rows per partition and
  buckets pack in parallel; there is no global ORDER BY.
- ``domain_mixture_sample`` shuffles once for the per-domain counts (tiny
  aggregate, broadcast back) and once for the per-domain rank window; a
  single giant domain can be pre-salted by capping with
  :func:`~..operators.sampling.cap_per_group` first.
- ``cluster_dedup`` is the coarse k-cluster variant (k small, explode-join
  assignment stays inside whole-stage codegen).  For fine-grained semantic
  dedup at scale use the SRP-LSH path in ``operators.dedup``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _MIX, portable_id_key

_P31 = 2147483647  # Mersenne prime 2^31-1; all bucket math is mod-P31


def _mix_hash(id_col: str | Column) -> Column:
    """Engine-portable scramble of an id (same family as
    sampling.split_bucket): multiplicative mix mod 2^31-1.  Id goes
    through ``portable_id_key`` — overflow-safe for any int64 and defined
    for string ids (identical values for in-range numeric ids)."""
    return F.pmod(portable_id_key(id_col) * F.lit(_MIX), F.lit(_P31))


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_groups: int = 64,
) -> DataFrame:
    """Assign every document to a fixed-token-budget training pack.

    Concat-and-cut semantics: within a pack group, documents are laid end to
    end in ``id_col`` order and the stream is cut every ``budget`` tokens; a
    document belongs to the pack where its first token falls (long documents
    straddle the cut, as in standard LM sequence packing).  Groups are
    deterministic hash buckets of the id, so packing is embarrassingly
    parallel — the window sorts only within a group — and reproducible on
    any engine: ``pack_id = group * 2^43 + floor(start/budget)``.  2^43
    cuts per group means a group's token stream can reach budget * 2^43
    (~1.8e16 tokens at budget=2048) before ids could collide — beyond any
    int64-summable corpus; the earlier 2^20 encoding overflowed into the
    next group's id space at ~2e9 tokens/group, silently merging packs
    across hash groups at exactly the 100 TB scale this targets.
    ``n_groups`` is capped at 2^20 so group * 2^43 stays inside int64.

    Adds ``pack_group``, ``pack_id``, ``pack_pos`` (token offset of the doc
    inside its pack).
    """
    if n_groups > 1 << 20:
        raise ValueError(f"n_groups must be <= 2^20, got {n_groups}")
    g = F.pmod(_mix_hash(id_col), F.lit(n_groups))
    out = df.withColumn("pack_group", g)
    w = (
        Window.partitionBy("pack_group")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col)).alias("_start")
    out = out.withColumn("_start", start)
    cut = F.floor(F.col("_start") / F.lit(budget))
    return (
        out.withColumn("pack_id", F.col("pack_group") * F.lit(1 << 43) + cut)
        .withColumn("pack_pos", F.col("_start") - cut * F.lit(budget))
        .drop("_start")
    )


def domain_mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministically downsample to a target domain mixture.

    Given target proportions ``weights`` (need not sum to 1; they are used
    as ratios), finds the largest total ``N`` the corpus can supply so every
    domain d can contribute ``floor(w_d * N)`` documents, then keeps exactly
    that many per domain — chosen by mixed-hash order (a deterministic
    engine-portable "random" subset), ties broken by id.

    Domains absent from ``weights`` are dropped.  Fully lazy: the feasible
    ``N`` (a one-row aggregate over the per-domain counts) re-enters the
    plan via a broadcast cross join, never the driver.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(d, float(w)) for d, w in sorted(weights.items())], ["_dom", "_w"]
    )
    return _mixture_sample_by_weights(df, domain_col, wdf, id_col)


def _mixture_sample_by_weights(
    df: DataFrame, domain_col: str, wdf: DataFrame, id_col: str
) -> DataFrame:
    """Largest-feasible-mixture core shared by the literal-weight and the
    temperature-weight samplers.  ``wdf`` is a tiny (_dom, _w) frame —
    literal OR computed in-plan — that stays broadcast throughout."""
    tagged = df.join(
        F.broadcast(wdf), F.col(domain_col) == F.col("_dom"), "inner"
    ).drop("_dom")
    # per-WEIGHT counts, not per-present-domain: a weighted domain with
    # zero corpus rows must clamp N toward 0 (floor(w_d*N) <= 0), or the
    # output silently violates the target mixture (e.g. 100% of one domain
    # against a 50/50 target).  Left join from the weight table keeps the
    # zero-count domains in the aggregate.
    present = df.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.count("*").alias("_cnt")
    )
    counts = wdf.join(F.broadcast(present), "_dom", "left").select(
        "_w", F.coalesce(F.col("_cnt"), F.lit(0)).alias("_cnt")
    )
    # largest N with floor(w_d*N) <= cnt_d for all d  <=>  N = min(floor(cnt_d/w_d))
    feasible = counts.agg(
        F.min(F.floor(F.col("_cnt") / F.col("_w"))).alias("_n")
    )
    w_rank = Window.partitionBy(domain_col).orderBy(
        _mix_hash(id_col), F.col(id_col)
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w_rank))
        .join(F.broadcast(feasible))
        .where(F.col("_rn") <= F.floor(F.col("_w") * F.col("_n")))
        .drop("_rn", "_w", "_n")
    )


def temperature_mixture_weights(
    df: DataFrame, domain_col: str, alpha: float = 0.3
) -> DataFrame:
    """Temperature-based domain weights (the XLM-R / mT5 multilingual
    sampling recipe, Conneau et al. 2020 §3.1 / Xue et al. 2021): weight
    each domain by its natural share raised to ``alpha`` and renormalize,

        w_d = p_d^alpha / sum_e p_e^alpha,   p_d = n_d / n_total.

    alpha=1 reproduces the natural distribution; alpha->0 approaches
    uniform; the published sweet spot for low-resource balancing is
    0.2-0.7.  Head domains are down-weighted, tail domains up-weighted,
    without any hand-written weight table.

    Fully lazy and all-broadcast: one groupBy over the corpus produces the
    per-domain counts; the total and the normalizer re-enter the plan as
    broadcast one-row frames.  Returns (domain_col, n_docs, natural_share,
    weight) — exact closed-form values, DuckDB-comparable.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    # NULL domains are excluded up front (same contract as domains absent
    # from a literal weight table).  Left in, the NULL group would earn a
    # weight but never equi-join back to its rows in the sampler — its
    # per-weight count reads 0, the feasible N clamps to 0, and the WHOLE
    # sampled corpus comes back empty.
    df = df.where(F.col(domain_col).isNotNull())
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("_tot"))
    powed = counts.join(F.broadcast(total)).select(
        domain_col,
        "n_docs",
        (F.col("n_docs") / F.col("_tot")).alias("natural_share"),
        F.pow(F.col("n_docs") / F.col("_tot"), F.lit(alpha)).alias("_pw"),
    )
    z = powed.agg(F.sum("_pw").alias("_z"))
    return powed.join(F.broadcast(z)).select(
        domain_col,
        "n_docs",
        "natural_share",
        (F.col("_pw") / F.col("_z")).alias("weight"),
    )


def temperature_mixture_sample(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Downsample the corpus to its own temperature-flattened mixture:
    ``temperature_mixture_weights`` computes w_d in-plan, then the shared
    largest-feasible-mixture core keeps floor(w_d * N) docs per domain
    (mixed-hash choice, deterministic).  No weight ever touches the
    driver — the weight frame is a per-domain aggregate that stays
    broadcast, so the whole thing is ONE lazy plan."""
    wdf = temperature_mixture_weights(df, domain_col, alpha).select(
        F.col(domain_col).alias("_dom"), F.col("weight").alias("_w")
    )
    return _mixture_sample_by_weights(df, domain_col, wdf, id_col)


def shard_assignment(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 1024
) -> DataFrame:
    """Deterministic output-shard id in [0, n_shards): the global shuffle of
    a training corpus, without RNG — the mixed hash scrambles any id
    locality (crawl order, source grouping) so every shard is an unbiased
    sample, and reruns produce byte-identical shard membership."""
    return df.withColumn("shard", F.pmod(_mix_hash(id_col), F.lit(n_shards)))


def write_sharded(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 1024,
    compression: str = "zstd",
) -> None:
    """Write the corpus as ``n_shards`` hash shards (one directory per
    shard).  ``repartition(shard)`` co-locates each shard's rows so every
    shard directory holds one file; readers stream shards independently."""
    out = shard_assignment(df, id_col, n_shards)
    (
        out.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .option("compression", compression)
        .partitionBy("shard")
        .parquet(path)
    )


def cluster_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """Coarse semantic dedup: deterministic k-cluster assignment + one
    representative per cluster.

    Seeds are the ``k`` rows with the smallest mixed id hash (ties by id) —
    a deterministic, engine-portable "random" init (no RNG, no kmeans||
    nondeterminism).  Every row is assigned to the seed with the highest
    cosine similarity (ties to the smaller seed id); the cluster
    representative is the member closest to its seed (ties to the smaller
    member id).  Assignment runs as posexplode -> equi-join on the dimension
    index -> hash aggregate, all inside whole-stage codegen — the same shape
    as the centroid_outliers oracle — with the k*dim seed side broadcast.

    Returns (id, cluster, sim, is_keeper); downstream semantic dedup keeps
    ``is_keeper`` rows.  For large k or fine-grained near-dup use the
    SRP-LSH route (operators.dedup.embedding_near_dup_pairs).
    """
    from ..catalog import ensure_parallelism

    # the posexplode dot-product stage is CPU-bound; a single-file corpus
    # arrives as one byte-sized split and serializes it (no-op at scale)
    base = ensure_parallelism(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
    )
    seeds = (
        base.select(
            F.col("_id").alias("_sid"),
            F.col("_v").alias("_sv"),
            _mix_hash("_id").alias("_h"),
        )
        .orderBy("_h", "_sid")
        .limit(k)
    )
    ex = base.select(
        "_id", F.posexplode("_v").alias("_i", "_x")
    )
    sx = seeds.select("_sid", F.posexplode("_sv").alias("_i", "_y"))
    dots = (
        ex.join(F.broadcast(sx), "_i")
        .groupBy("_id", "_sid")
        .agg(
            F.sum(F.col("_x") * F.col("_y")).alias("_dot"),
            F.sum(F.col("_x") * F.col("_x")).alias("_nx"),
            F.sum(F.col("_y") * F.col("_y")).alias("_ny"),
        )
        .select(
            "_id",
            "_sid",
            F.round(
                F.col("_dot") / (F.sqrt("_nx") * F.sqrt("_ny")), 6
            ).alias("sim"),
        )
    )
    w_assign = Window.partitionBy("_id").orderBy(F.desc("sim"), F.col("_sid"))
    assigned = (
        dots.withColumn("_rk", F.row_number().over(w_assign))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )
    w_rep = Window.partitionBy("_sid").orderBy(F.desc("sim"), F.col("_id"))
    return assigned.select(
        F.col("_id").alias(id_col),
        F.col("_sid").alias("cluster"),
        "sim",
        (F.row_number().over(w_rep) == 1).alias("is_keeper"),
    )


def pack_token_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "input_ids",
    budget: int = 2048,
    n_groups: int = 64,
    eos_id: int = 0,
    drop_last: bool = True,
) -> DataFrame:
    """Materialize PACKED TRAINING EXAMPLES: fixed-length token-id
    sequences cut from the document stream — the actual tensor format a
    pretraining job consumes (``pack_sequences`` assigns docs to packs;
    this emits the packs themselves).

    Semantics match ``pack_sequences`` exactly: within a deterministic
    hash group, documents (each terminated by ``eos_id``) are laid end to
    end in ``id_col`` order and the token stream is cut every ``budget``
    tokens; a straddling document spills into the next sequence (standard
    LM concat-and-cut).  ``drop_last`` drops each group's final partial
    sequence (every emitted ``input_ids`` is exactly ``budget`` long);
    with ``drop_last=False`` the tail sequences come through short.

    Scale shape: one window shuffle per hash group for the running start
    offsets, ONE posexplode (narrow: two ints per token row, no Python
    boundary), one hash aggregate on the sequence id whose per-group
    state is bounded by ``budget`` ints.  No global sort, no driver
    round-trip; reproducible on any cluster size.  NULL id arrays pack
    as empty docs (their eos still marks them in-stream).

    Returns ``(seq_id, input_ids, n_tokens)``; ``seq_id = group * 2^43 +
    cut`` exactly like ``pack_sequences`` (same overflow headroom).
    """
    if n_groups > 1 << 20:
        raise ValueError(f"n_groups must be <= 2^20, got {n_groups}")
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    ids2 = F.concat(
        F.coalesce(F.col(ids_col).cast("array<int>"), F.array().cast("array<int>")),
        F.array(F.lit(int(eos_id)).cast("int")),
    )
    g = F.pmod(_mix_hash(id_col), F.lit(n_groups))
    base = df.select(
        F.col(id_col).alias("_pid"), ids2.alias("_ids"), g.alias("_g")
    )
    w = (
        Window.partitionBy("_g")
        .orderBy(F.col("_pid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    started = base.withColumn(
        "_start", F.sum(F.size("_ids")).over(w) - F.size("_ids")
    )
    toks = started.select(
        "_g",
        "_start",
        F.posexplode("_ids").alias("_pos", "_tok"),
    ).select(
        "_g",
        (F.col("_start") + F.col("_pos")).alias("_gpos"),
        "_tok",
    )
    cut = F.floor(F.col("_gpos") / F.lit(budget))
    seqs = (
        toks.withColumn("_seq", F.col("_g") * F.lit(1 << 43) + cut)
        .withColumn("_off", (F.col("_gpos") - cut * F.lit(budget)).cast("int"))
        .groupBy("_seq")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_off", "_tok"))),
                lambda s: s["_tok"],
            ).alias("input_ids")
        )
        .select(
            F.col("_seq").alias("seq_id"),
            "input_ids",
            F.size("input_ids").alias("n_tokens"),
        )
    )
    if drop_last:
        seqs = seqs.where(F.col("n_tokens") == budget)
    return seqs


def token_budget_mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Downsample to a target domain mixture measured in TOKENS — the
    unit training budgets are actually specified in (a 30%-code mix means
    30% of the tokens, and doc-count mixing silently skews toward the
    short-doc domain).

    Finds the largest total token budget ``B`` every weighted domain can
    supply (``B = min_d floor(tokens_d / w_d)``), then keeps per domain
    the mixed-hash-ordered prefix of documents whose running token sum
    stays within ``floor(w_d * B)`` — strict: the straddling document is
    dropped, so every domain lands AT OR UNDER its quota and the realized
    mixture can only err toward balance.  Deterministic, engine-portable,
    fully lazy (the budget re-enters the plan as a broadcast one-row
    aggregate; same shape as :func:`domain_mixture_sample`).

    Adds ``cum_tokens`` (the running sum INCLUDING the row) to the
    output; domains absent from ``weights`` are dropped.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(d, float(w)) for d, w in sorted(weights.items())], ["_dom", "_w"]
    )
    tagged = df.join(
        F.broadcast(wdf), F.col(domain_col) == F.col("_dom"), "inner"
    ).drop("_dom")
    # per-WEIGHT token totals (zero for weighted-but-absent domains, which
    # clamp B toward 0 — same contract as the doc-count sampler)
    present = df.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.sum(tokens_col).alias("_tok")
    )
    totals = wdf.join(F.broadcast(present), "_dom", "left").select(
        "_w", F.coalesce(F.col("_tok"), F.lit(0)).alias("_tok")
    )
    feasible = totals.agg(
        F.min(F.floor(F.col("_tok") / F.col("_w"))).alias("_b")
    )
    w_cum = (
        Window.partitionBy(domain_col)
        .orderBy(_mix_hash(id_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("cum_tokens", F.sum(tokens_col).over(w_cum))
        .join(F.broadcast(feasible))
        .where(F.col("cum_tokens") <= F.floor(F.col("_w") * F.col("_b")))
        .drop("_w", "_b")
    )
