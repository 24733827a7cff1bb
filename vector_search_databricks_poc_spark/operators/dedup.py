"""Deduplication operators (SURVEY.md B9/B10; north-star "dedup").

The reference's only dedup is a Python ``seen``-set over top-k results
(main.py:62-67).  At 100 TB dedup is a first-class pipeline stage; this
module gives the standard ladder:

- exact: hash group-by on the key (deterministic keeper = min id);
- MinHash + LSH banding: shingle -> minhash signature -> band buckets ->
  bucket equi-join -> Jaccard verify (near-dup at scale, one shuffle on
  band buckets instead of an all-pairs product);
- SimHash: 64-bit signed-projection fingerprint, hamming-ball verify;
- n-gram Jaccard: exact set-similarity join for small candidate sets;
- embedding cosine: near-dup via the vector kernel.

All hash-based signatures use Spark's ``xxhash64``/``hash`` (engine-local,
not oracle-portable — the driver records these as rows-only checks; the
pytest suite asserts planted-duplicate recall instead, SURVEY.md §5.2).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from .. import vectors as V
from .text import tokens

_LOG = logging.getLogger(__name__)


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep exactly one row per key — the minimum id (deterministic, unlike
    ``dropDuplicates`` whose survivor depends on partition order).

    NULL-keyed rows pass through UNTOUCHED: the semi-join's equality never
    matches NULL = NULL, so without the split every null-key row would be
    silently DELETED (data loss, not dedup).  Passing them through treats
    each NULL as its own key — matching SQL join semantics; callers who
    want null keys collapsed should coalesce the key first.
    """
    any_null = None
    for k in key_cols:
        cond = F.col(k).isNull()
        any_null = cond if any_null is None else (any_null | cond)
    non_null = df.where(~any_null)
    keep = non_null.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    deduped = non_null.join(keep, on=key_cols + [id_col], how="left_semi")
    return deduped.unionByName(df.where(any_null))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as strings."""
    t = tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
    return F.when(
        F.size(t) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, n))),
    ).otherwise(F.array(F.concat_ws(" ", t)))


def minhash_signature(text: Column | str, n: int = 3, num_hashes: int = 32) -> Column:
    """MinHash signature as a single Column: per hash function i, min over
    shingles of xxhash64(shingle, seed=i).

    Note: higher-order functions are interpreted (no whole-stage codegen);
    for corpus-scale signature computation prefer ``minhash_signatures_df``,
    whose vectorized-numpy stage computes all mins in one Arrow batch pass.
    """
    sh = shingles(text, n)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


_PORTABLE_P = 2147483647  # Mersenne prime 2^31-1; products stay in int64


def portable_string_hash(s: Column) -> Column:
    """Engine-portable polynomial string hash: fold over characters,
    acc = (acc*131 + ascii(char)) mod (2^31-1).  Pure integer arithmetic —
    any SQL engine (the DuckDB oracle included) reproduces it bit-exactly.
    Slower than xxhash64 (per-char fold); use for oracle-verified paths."""
    idx = F.sequence(F.lit(1), F.length(s))
    return F.aggregate(
        F.transform(idx, lambda i: F.ascii(F.substring(s, i.cast("int"), 1)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 131 + c) % _PORTABLE_P,
    )


def _affine(i: int, x: Column) -> Column:
    """i-th portable hash family member: (a_i*x + b_i) mod P."""
    a = 2 * i + 3
    b = (i * 2654435761) % _PORTABLE_P
    return (F.lit(a).cast("long") * x + F.lit(b).cast("long")) % _PORTABLE_P


def minhash_signatures_portable_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Portable-arithmetic MinHash signatures: same shape as
    ``minhash_signatures_df`` but with the polynomial shingle hash and an
    affine hash family — every value reproducible by the DuckDB oracle."""
    from ..catalog import ensure_parallelism

    ex = ensure_parallelism(df).select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("_sh")
    )
    hashed = ex.select(id_col, portable_string_hash(F.col("_sh")).alias("_x"))
    cols = [_affine(i, F.col("_x")).alias(f"_h{i}") for i in range(num_hashes)]
    mins = hashed.select(id_col, *cols).groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_h{i}") for i in range(num_hashes)]
    )
    return mins.select(
        id_col, F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("_sig")
    )


def minhash_signatures_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """(id, _sig array<long>) via the scale path — no shingle STRINGS ever
    materialize, NO explode, and NO shuffle at all:

    1. hash each token ONCE per row JVM-side (xxhash64 twice over the
       token array — the only string hashing; |tokens| calls, not
       |shingles| string builds);
    2. shingle hash = XOR-rotate combination of n consecutive token
       hashes (sentinel-padded for docs shorter than n tokens so short
       docs hash by their real tokens and never funnel into one band
       bucket); signature slot i = min over shingles of
       ``h1 XOR rot(h2, i)`` (Kirsch-Mitzenmacher double hashing).
       Steps 2-3 run as ONE Arrow-batched ``mapInPandas`` stage doing
       vectorized uint64 numpy arithmetic.

    Why numpy and not array expressions: the per-row formulation needs
    higher-order functions (``zip_with``/``array_min``/``transform``),
    which Catalyst evaluates INTERPRETED — whole-stage codegen does not
    cover lambda bodies — at roughly 1,700 lambda invocations per doc
    for 32 hashes.  Measured at sf0.1 the HOF projection costs ~2x the
    vectorized numpy stage (0.97s vs 0.65s end-to-end), and the explode +
    codegen-hash-agg formulation is no better (1.23s, plus a shuffle).
    The expression formulation is kept as
    ``minhash_signatures_expr_df`` — a second, independent evaluation
    path asserted bit-identical in tests.

    Still a pure map over the corpus scan at 100 TB: the Arrow boundary
    transfers (id, token-hash arrays), ~2 longs per token, and ships
    nothing anywhere.  Bit-identical hash family and values to the
    r2/r3 explode version and to ``minhash_signatures_expr_df``; the
    oracle-portable variant (bit-exact cross-engine hashes) is
    ``minhash_signatures_portable_df``.
    """
    import pandas as pd

    from ..catalog import ensure_parallelism

    t = tokens(text_col)
    base = ensure_parallelism(df).select(F.col(id_col), t.alias("_t"))
    # empty-token docs produce no signature row, mirroring the explode
    # semantics of the string-shingle path
    hashed = base.select(
        F.col(id_col),
        F.transform("_t", lambda tok: F.xxhash64(tok)).alias("_ht1"),
        F.transform("_t", lambda tok: F.xxhash64(tok, F.lit(1))).alias("_ht2"),
    ).where(F.size("_ht1") > 0)

    id_field = hashed.schema[id_col]

    def compute(iterator):
        import numpy as np

        u64 = np.uint64
        shifts1 = [u64((7 * j + 1) % 64) for j in range(n)]
        shifts2 = [u64((11 * j + 3) % 64) for j in range(n)]
        sent1 = [u64(1_000_003 * (j + 1)) for j in range(n)]
        sent2 = [u64(998_244_353 * (j + 1)) for j in range(n)]

        def rot_arr(x, s):  # x: uint64 array, s: uint64 scalar (0 < s < 64)
            return np.left_shift(x, s) | np.right_shift(x, u64(64) - s)

        # The whole Arrow batch is flattened into ONE shingle-hash array and
        # processed with numpy segment ops (minimum.reduceat at doc
        # boundaries) — no per-document Python loop: at a 10k-row batch the
        # loop body itself (30k tiny numpy calls) used to dominate the
        # stage.  Bit-identical to the per-doc formulation and to
        # minhash_signatures_expr_df (asserted in tests).
        for pdf in iterator:
            if not len(pdf):
                continue
            rows1 = [np.asarray(x, dtype=np.int64) for x in pdf["_ht1"]]
            rows2 = [np.asarray(x, dtype=np.int64) for x in pdf["_ht2"]]
            sz = np.fromiter((len(x) for x in rows1), dtype=np.int64, count=len(rows1))
            a1 = np.concatenate(rows1).view(u64)
            a2 = np.concatenate(rows2).view(u64)
            nsh = np.maximum(sz - (n - 1), 1)
            seg_starts = np.zeros(len(nsh), dtype=np.int64)
            np.cumsum(nsh[:-1], out=seg_starts[1:])
            total = int(seg_starts[-1] + nsh[-1])
            doc_start = np.repeat(np.cumsum(sz) - sz, nsh)  # flat offset of doc
            sz_rep = np.repeat(sz, nsh)
            local_k = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, nsh)
            last_idx = doc_start + sz_rep - 1
            sh1 = np.zeros(total, dtype=u64)
            sh2 = np.zeros(total, dtype=u64)
            for j in range(n):
                in_range = (local_k + j) < sz_rep
                idx = np.minimum(doc_start + local_k + j, last_idx)
                e1 = np.where(in_range, a1[idx], sent1[j])
                e2 = np.where(in_range, a2[idx], sent2[j])
                sh1 ^= rot_arr(e1, shifts1[j]) if shifts1[j] else e1
                sh2 ^= rot_arr(e2, shifts2[j]) if shifts2[j] else e2
            # one hash index at a time keeps peak extra memory at O(total)
            # instead of O(num_hashes * total); min is SIGNED (Spark
            # array_min over long), so view back to int64 before reducing
            sig = np.empty((len(sz), num_hashes), dtype=np.int64)
            for i in range(num_hashes):
                s = u64(i % 64)
                comb = sh1 ^ (rot_arr(sh2, s) if s else sh2)
                sig[:, i] = np.minimum.reduceat(comb.view(np.int64), seg_starts)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "_sig": sig.tolist()})

    out_schema = StructType(
        [id_field, StructField("_sig", ArrayType(LongType()), False)]
    )
    return hashed.mapInPandas(compute, schema=out_schema)


def minhash_signatures_expr_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Pure-Catalyst-expression twin of ``minhash_signatures_df`` — same
    hash family, bit-identical output, zero Python.  Kept as (a) the
    independent second implementation the differential tests compare
    against, and (b) the fallback for environments where a Python worker
    per executor is undesirable.  Slower on wide corpora: the per-row
    mins run as interpreted higher-order functions (no codegen), see the
    main docstring's measurements.
    """
    from ..catalog import ensure_parallelism

    def rot(c, i):
        i = i % 64
        if i == 0:
            return c
        return F.shiftleft(c, i).bitwiseOR(F.shiftrightunsigned(c, 64 - i))

    t = tokens(text_col)
    base = ensure_parallelism(df).select(F.col(id_col), t.alias("_t"))
    hashed = base.select(
        id_col,
        F.transform("_t", lambda tok: F.xxhash64(tok)).alias("_ht1"),
        F.transform("_t", lambda tok: F.xxhash64(tok, F.lit(1))).alias("_ht2"),
        # n_shingles = size-n+1, or 1 for docs shorter than n tokens
        # (partial window padded by per-position sentinels below)
        F.greatest(F.size("_t") - (n - 1), F.lit(1)).alias("_nsh"),
        F.size("_t").alias("_sz"),
    )

    def shingle_hashes(ht, rot_of_j, sentinel):
        def one(i):
            acc = None
            for j in range(n):
                e = F.coalesce(
                    F.get(ht, i + F.lit(j)),
                    F.lit(sentinel * (j + 1)).cast("long"),
                )
                r = rot(e, rot_of_j(j))
                acc = r if acc is None else acc.bitwiseXOR(r)
            return acc

        return F.transform(F.sequence(F.lit(0), F.col("_nsh") - 1), one)

    # empty-token docs produce no signature row, mirroring the explode
    # semantics of the string-shingle path
    pre = hashed.where(F.col("_sz") > 0).select(
        id_col,
        shingle_hashes(F.col("_ht1"), lambda j: 7 * j + 1, 1_000_003).alias("_h1a"),
        shingle_hashes(F.col("_ht2"), lambda j: 11 * j + 3, 998_244_353).alias("_h2a"),
    )
    mins = [
        F.array_min(
            F.zip_with("_h1a", "_h2a", lambda a, b: a.bitwiseXOR(rot(b, i)))
        ).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return pre.select(id_col, *mins).select(
        id_col, F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("_sig")
    )


def minhash_banded_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
) -> DataFrame:
    """(id, _band, _bucket) LSH band rows — the joinable/persistable form of
    a MinHash signature (``bands`` rows per doc).  Shared by the one-shot
    self-join path (minhash_lsh_candidates) and the incremental signature
    store (write_signature_store / incremental_minhash_near_dup)."""
    rows_per_band = num_hashes // bands
    # The callers reference this twice (self-join / cand-id union); without
    # a materialization the whole shingle->hash->min pipeline runs twice.
    # Signatures are tiny (num_hashes longs per doc) — checkpoint them.
    # (In a production pipeline this is the persisted signature table.)
    sig_fn = minhash_signatures_portable_df if portable else minhash_signatures_df
    sig = sig_fn(df, id_col, text_col, n, num_hashes).localCheckpoint(eager=False)

    def band_bucket(b: int) -> Column:
        vals = [F.element_at("_sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
        if portable:
            acc = F.lit(0).cast("long")
            for v in vals:
                acc = (acc * 131 + v) % _PORTABLE_P
            return acc
        return F.xxhash64(F.concat_ws(",", *vals))

    return sig.select(
        id_col,
        F.posexplode(F.array(*[band_bucket(b) for b in range(bands)])).alias(
            "_band", "_bucket"
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: rows sharing any band of
    the MinHash signature.  Returns (id_a, id_b) with id_a < id_b.

    The band bucket is the join key — the only shuffle is on
    (band_idx, band_hash), so cost scales with collisions, not n^2.
    ``portable=True`` switches to the arithmetic hash family the DuckDB
    oracle can reproduce bit-exactly.

    ``max_bucket_size`` caps band-bucket skew: on pathological corpora
    (thousands of near-identical docs) one bucket can hold a large share of
    the corpus and the bucket self-join explodes quadratically on a single
    task.  With a cap, buckets above the limit are dropped — the docs in
    them are near-identical to each other, so any surviving smaller bucket
    (a less-collapsed band) still links them; worst case the cap trades
    bounded recall loss for bounded cost.  Default None = exact banding
    (required for the oracle-portable path).
    """
    banded = minhash_banded_df(df, id_col, text_col, n, num_hashes, bands, portable)
    if max_bucket_size is not None:
        from pyspark.sql import Window as _W

        bucket_n = F.count("*").over(_W.partitionBy("_band", "_bucket"))
        banded = (
            banded.withColumn("_bn", bucket_n)
            .where(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col(f"l._band") == F.col(f"r._band"),
                F.col(f"l._bucket") == F.col(f"r._bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two string arrays (as sets)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
    max_bucket_size: int | None = None,
    verify_broadcast: bool = False,
) -> DataFrame:
    """Near-dup pairs: LSH candidates verified by exact shingle Jaccard.

    Shingle sets are materialized ONLY for rows that appear in some candidate
    pair (semi-join first) — at corpus scale the candidate set is tiny
    relative to the corpus and full shingle materialization would dominate.

    ``verify_broadcast=True`` broadcasts the candidate shingle table into
    the two verification joins (a join-strategy hint, results identical):
    right when the caller KNOWS the candidate set is small — demo corpora,
    or production runs where the banding threshold keeps candidates sparse.
    The default (False) leaves the verify joins to shuffle + AQE, which is
    the safe choice when candidate volume is unknown: shingle arrays are
    orders of magnitude wider than the id column, and only the ids are
    unconditionally broadcast here.
    """
    cands = minhash_lsh_candidates(
        df, id_col, text_col, n, num_hashes, bands, portable, max_bucket_size
    ).localCheckpoint(eager=False)  # referenced twice below (cand_ids + the
    # pair join); without a cut the band self-join would execute twice
    cand_ids = (
        cands.select(F.col("id_a").alias(id_col))
        .unionByName(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = df.join(F.broadcast(cand_ids), on=id_col, how="left_semi").select(
        F.col(id_col), F.array_distinct(shingles(text_col, n)).alias("_sh")
    )
    hint = F.broadcast if verify_broadcast else (lambda x: x)
    return (
        cands.join(hint(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "_sh_a")), "id_a")
        .join(hint(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "_sh_b")), "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("_sh_a"), F.col("_sh_b")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def write_signature_store(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
    mode: str = "overwrite",
) -> None:
    """Persist the LSH band rows of a corpus as the incremental-dedup
    signature store: parquet partitioned by ``_band``, appendable
    (``mode='append'`` when a new batch is admitted).  The store holds
    ``bands`` rows of (id, _bucket) per doc — a few dozen bytes, vs the
    full text — so dedup of future batches never re-reads, re-hashes, or
    shuffles the historical corpus."""
    banded = minhash_banded_df(df, id_col, text_col, n, num_hashes, bands, portable)
    banded.write.mode(mode).partitionBy("_band").parquet(path)


def incremental_minhash_near_dup(
    new_df: DataFrame,
    store: DataFrame,
    historical_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
) -> DataFrame:
    """Near-dups of a NEW batch against a persisted signature store plus
    within the batch itself — without recomputing or shuffling anything
    over the historical corpus.

    Returns (id_a, id_b, jaccard, origin): origin='new_old' pairs a new doc
    (id_a) with a store doc (id_b); origin='new_new' pairs two new docs
    (id_a < id_b).  Exactness contract: identical hash family to the
    one-shot path, so the result equals minhash_near_dup_pairs over
    (historical ∪ new) restricted to pairs touching the new batch — the
    equivalence is asserted in tests.  Id spaces must be disjoint across
    batches.

    100 TB shape: the new batch's band rows are BROADCAST into the store
    join, so the store (bands × |corpus| rows) streams past them with no
    shuffle and no driver materialization; historical text is touched only
    for candidate ids (broadcast semi-join prune) during exact-verify.
    """
    new_banded = minhash_banded_df(
        new_df, id_col, text_col, n, num_hashes, bands, portable
    ).localCheckpoint(eager=False)

    # new-vs-store candidates: store side never shuffles (broadcast probe)
    cross = (
        store.alias("s")
        .join(
            F.broadcast(new_banded).alias("nw"),
            on=[
                F.col("s._band") == F.col("nw._band"),
                F.col("s._bucket") == F.col("nw._bucket"),
            ],
        )
        .select(
            F.col(f"nw.{id_col}").alias("id_a"),
            F.col(f"s.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # new-vs-new candidates: band self-join within the (small) batch
    l, r = new_banded.alias("l"), new_banded.alias("r")
    intra = (
        l.join(
            r,
            on=[
                F.col("l._band") == F.col("r._band"),
                F.col("l._bucket") == F.col("r._bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cands = (
        cross.withColumn("origin", F.lit("new_old"))
        .unionByName(intra.withColumn("origin", F.lit("new_new")))
        .localCheckpoint(eager=False)  # referenced by two shingle joins below
    )

    sh_new = new_df.join(
        F.broadcast(
            cands.select(F.col("id_a").alias(id_col))
            .unionByName(cands.select(F.col("id_b").alias(id_col)))
            .distinct()
        ),
        on=id_col,
        how="left_semi",
    ).select(F.col(id_col), F.array_distinct(shingles(text_col, n)).alias("_sh"))
    sh_old = historical_df.join(
        F.broadcast(cands.select(F.col("id_b").alias(id_col)).distinct()),
        on=id_col,
        how="left_semi",
    ).select(F.col(id_col), F.array_distinct(shingles(text_col, n)).alias("_sh"))
    # id_a is always a new doc; id_b is a store doc for new_old pairs and a
    # new doc for new_new pairs — resolve from the union of both shingle legs
    sh_b = sh_new.unionByName(sh_old).dropDuplicates([id_col])
    return (
        cands.join(
            sh_new.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "_sh_a"),
            "id_a",
        )
        .join(
            sh_b.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "_sh_b"),
            "id_b",
        )
        .withColumn("jaccard", F.round(jaccard(F.col("_sh_a"), F.col("_sh_b")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard", "origin")
    )


def simhash(text: Column | str, bits: int = 64) -> Column:
    """SimHash fingerprint: sign of per-bit weighted sums of token hashes.

    Implemented bit-parallel: for each token take xxhash64, then for each bit
    add +1/-1 to that bit's counter; fingerprint bit = counter >= 0.
    Returns a long (bits<=64).
    """
    t = tokens(text)
    hashes = F.transform(t, lambda tok: F.xxhash64(tok))
    fp = F.lit(0).cast("long")
    for b in range(bits):
        cnt = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        fp = fp.bitwiseOR(
            F.when(cnt >= 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return fp


def simhash_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """(id, _fp long) via the scale path: explode tokens -> one xxhash64 ->
    per-bit +-1 contribution columns -> codegen hash-aggregate sums ->
    assemble the fingerprint.  Same result as ``simhash`` without the
    interpreted per-row lambda fold.  ``portable=True`` uses the
    polynomial token hash (31-bit, oracle-reproducible) — pass bits<=31."""
    from ..catalog import ensure_parallelism

    ex = ensure_parallelism(df).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    )
    if portable:
        assert bits <= 31, "portable hash is 31-bit"
        ex = ex.select(id_col, portable_string_hash(F.col("_tok")).alias("_h"))
    else:
        ex = ex.select(id_col, F.xxhash64("_tok").alias("_h"))
    contrib = ex.select(
        id_col,
        *[
            F.when(F.shiftright("_h", b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"_b{b}")
            for b in range(bits)
        ],
    )
    sums = contrib.groupBy(id_col).agg(
        *[F.sum(f"_b{b}").alias(f"_b{b}") for b in range(bits)]
    )
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp.bitwiseOR(
            F.when(F.col(f"_b{b}") >= 0, F.shiftleft(F.lit(1).cast("long"), b))
            .otherwise(F.lit(0).cast("long"))
        )
    return sums.select(id_col, fp.alias("_fp"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 64,
    blocks: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """SimHash near-dup: block the fingerprint into ``blocks`` chunks;
    by pigeonhole any pair within ``max_hamming`` (< blocks) distance shares
    at least one exact block -> equi-join on (block_idx, block_value), then
    verify full hamming distance.

    ``blocks`` defaults to ``max_hamming + 1`` — the minimum satisfying the
    pigeonhole precondition.  Passing blocks <= max_hamming raises: the
    candidate join would silently miss true pairs (a pair can differ in
    every block while staying within max_hamming)."""
    if blocks is None:
        blocks = max_hamming + 1
    if max_hamming >= blocks:
        raise ValueError(
            f"pigeonhole requires max_hamming < blocks, got "
            f"max_hamming={max_hamming}, blocks={blocks}"
        )
    if blocks > bits:
        raise ValueError(f"blocks={blocks} cannot exceed bits={bits}")
    width = bits // blocks
    mask = (1 << width) - 1
    sig = simhash_df(df, id_col, text_col, bits, portable)
    blocked = sig.select(
        id_col,
        "_fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("_fp", i * width).bitwiseAND(F.lit(mask).cast("long"))
                    for i in range(blocks)
                ]
            )
        ).alias("_blk", "_val"),
    )
    l, r = blocked.alias("l"), blocked.alias("r")
    return (
        l.join(
            r,
            on=[
                F.col("l._blk") == F.col("r._blk"),
                F.col("l._val") == F.col("r._val"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            hamming64(F.col("l._fp"), F.col("r._fp")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via shingle inverted index:
    explode shingles -> self-join on shingle -> count shared / union.
    SQL-expressible (oracle-checkable), and still one shuffle on the
    shingle key rather than an n^2 cross product."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(text_col, n)).alias("_sh"),
    )
    sizes = sh.select("id", F.size("_sh").alias("n_sh"))
    inv = sh.select("id", F.explode("_sh").alias("shingle"))
    shared = (
        inv.alias("a")
        .join(inv.alias("b"), on=[F.col("a.shingle") == F.col("b.shingle"), F.col("a.id") < F.col("b.id")])
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _estimate_rows(df: DataFrame, assumed_row_bytes: int = 512) -> int:
    """Driver-side row-count estimate from Catalyst plan statistics — runs
    NO job.  Uses the optimizer's rowCount when available (CBO / AQE),
    falling back to sizeInBytes / assumed_row_bytes (order-of-magnitude is
    all the callers need: block sizing and exact-vs-pruned routing)."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    if rc.isDefined():
        return int(str(rc.get()))
    return max(1, int(str(stats.sizeInBytes())) // assumed_row_bytes)


def srp_lsh_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs for EMBEDDINGS via sign-random-projection
    LSH: each vector is hashed to ``n_planes`` sign bits (sign of the dot
    product with a pseudo-random +-1 hyperplane), the bits are grouped into
    ``bands``, and rows sharing any (band, bucket) become candidates.

    P(bit agrees) = 1 - angle/pi, so near-identical vectors collide in some
    band with high probability while unrelated ones don't.  The plane signs
    come from a hash of (plane, dim_index) — no materialized plane matrix,
    works for any dimensionality, deterministic under ``seed``.  Scale
    shape: explode to (row, dim) -> codegen hash-agg of per-plane sums ->
    band-bucket equi-join.  One shuffle on the bucket key, never n^2.
    """
    from ..catalog import ensure_parallelism

    ex = ensure_parallelism(df).select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("_i", "_v"),
    )
    sign = lambda p: (  # noqa: E731
        F.when(
            F.pmod(F.xxhash64(F.lit(p * 1_000_003) + F.col("_i"), F.lit(seed)), 2) == 1,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
    )
    contrib = ex.select(
        id_col, *[(F.col("_v") * sign(p)).alias(f"_p{p}") for p in range(n_planes)]
    )
    sums = contrib.groupBy(id_col).agg(
        *[F.sum(f"_p{p}").alias(f"_p{p}") for p in range(n_planes)]
    )
    per_band = n_planes // bands

    def band_val(b: int) -> Column:
        acc = F.lit(0).cast("long")
        for j in range(per_band):
            bit = F.when(F.col(f"_p{b * per_band + j}") >= 0, 1).otherwise(0).cast("long")
            acc = acc * 2 + bit
        return acc

    banded = sums.select(
        id_col,
        F.posexplode(F.array(*[band_val(b) for b in range(bands)])).alias("_band", "_bucket"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            on=[
                F.col("l._band") == F.col("r._band"),
                F.col("l._bucket") == F.col("r._bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_size: int = 1024,
    n_rows: int | None = None,
    max_exact_rows: int = 100_000,
    lsh_planes: int = 16,
    lsh_bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-dup by embedding cosine.  Safe-by-default at scale:

    - up to ``max_exact_rows`` rows: exact all-pairs via **block matrix
      multiply** — rows are hashed into blocks, every block pair scored in
      one Arrow batch with a numpy matmul inside ``applyInPandas``;
    - above it: auto-route through SRP-LSH candidate generation
      (``srp_lsh_candidates``) + exact cosine verification of candidates —
      all-pairs is O(n^2 d) no matter how it's blocked, so past ~10^5 rows
      the pruned path is the only one that survives a 100x scale-up.

    ``n_rows`` skips the row estimate when the caller knows the count;
    otherwise a plan-statistics estimate is used (no job, see
    ``_estimate_rows``).  Force a path with ``max_exact_rows=0`` (always
    pruned) or a large value (always exact).

    Why a matmul and not the expression kernel: per-pair
    ``aggregate(zip_with(...))`` is interpreted (no codegen), ~15x slower
    than one BLAS matmul per block pair.
    """
    import math as _math

    import numpy as np
    import pandas as pd

    n = n_rows if n_rows is not None else _estimate_rows(df)
    # the exact/pruned switch changes RESULTS (LSH-recall vs all-pairs), so
    # the routing decision must be observable: a plan-statistics estimate
    # drifting past max_exact_rows would otherwise silently flip output
    _LOG.info(
        "embedding_near_dup_pairs: path=%s rows=%d (%s) max_exact_rows=%d",
        "srp-lsh" if n > max_exact_rows else "exact-blocked-matmul",
        n,
        "caller-supplied" if n_rows is not None else "plan-estimate",
        max_exact_rows,
    )
    if n > max_exact_rows:
        cands = srp_lsh_candidates(
            df, id_col, vec_col, n_planes=lsh_planes, bands=lsh_bands, seed=seed
        )
        src = df.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
            V.l2_norm(F.col(vec_col).cast("array<double>")).alias("_n"),
        )
        a = src.select(
            F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
        )
        b = src.select(
            F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
        )
        return (
            cands.join(a, "id_a")
            .join(b, "id_b")
            .withColumn(
                "cosine", F.round(V.dot("_va", "_vb") / (F.col("_na") * F.col("_nb")), 6)
            )
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )
    # enough block-pairs to keep every core busy: B(B+1)/2 >= 2*cores,
    # bounded below by the memory-driven block_size cap.  Replication per
    # row is B (trivial vs the n^2 d flops the blocks distribute).  The
    # cores-busy floor only applies when the pair count can amortize the
    # per-task Arrow/pandas overhead — a tiny exact job fragmented into
    # dozens of tasks spends more on scheduling than on BLAS (measured:
    # 2k vectors at B=12 is ~30% slower than B=4 for identical output).
    cores = df.sparkSession.sparkContext.defaultParallelism
    if (n * n) / max(cores, 1) >= 250_000:  # >=0.25M pairs/core: fan out fully
        busy = min(_math.ceil(_math.sqrt(4 * cores)), max(1, n // 8))
    else:
        busy = min(4, max(1, n // 8))
    n_blocks = max(1, _math.ceil(n / block_size), busy)
    # a float32 source shuffles as float32 (half the replicated bytes) and
    # promotes to float64 inside the kernel — bit-identical to casting in
    # the plan, since float→double promotion is exact; a float64 source
    # keeps its full precision
    from pyspark.sql.types import ArrayType, FloatType

    et = df.schema[vec_col].dataType
    src_is_float = isinstance(et, ArrayType) and isinstance(
        et.elementType, FloatType
    )
    vexpr = (
        F.col(vec_col) if src_is_float else F.col(vec_col).cast("array<double>")
    )
    # no pre-shuffle repartition: the heavy work (the matmuls) happens
    # AFTER the (bi,bj) group shuffle, which already redistributes; the
    # pre-shuffle stage is a cheap projection+explode that the scan's
    # natural splits parallelize fine at scale, and for small inputs the
    # extra exchange was ~30% of wall time (measured at sf0.1)
    src = df.select(
        F.col(id_col).alias("_id"),
        vexpr.alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    # each row belongs to every block-pair where its block appears on
    # either side — emitted as ONE in-plan explode (n_blocks structs per
    # row) instead of two broadcast joins + a union: a single scan of the
    # source feeding straight into the one group shuffle
    pair_structs = F.transform(
        F.sequence(F.lit(0), F.lit(n_blocks - 1)),
        lambda x: F.struct(
            F.least(x, F.col("_blk")).alias("bi"),
            F.greatest(x, F.col("_blk")).alias("bj"),
            F.when(F.col("_blk") <= x, F.lit("L"))
            .otherwise(F.lit("R"))
            .alias("_side"),
        ),
    )
    tagged = src.select(
        "_id", "_v", F.explode(pair_structs).alias("_p")
    ).select(
        F.col("_p.bi").alias("bi"),
        F.col("_p.bj").alias("bj"),
        "_id",
        "_v",
        F.col("_p._side").alias("_side"),
    )

    thr = float(threshold)

    def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
        same = (pdf["bi"].iat[0] == pdf["bj"].iat[0]) if len(pdf) else True
        left = pdf[pdf["_side"] == "L"] if not same else pdf
        right = pdf[pdf["_side"] == "R"] if not same else pdf
        if left.empty or right.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        la = np.stack(left["_v"].to_numpy()).astype(np.float64, copy=False)
        rb = np.stack(right["_v"].to_numpy()).astype(np.float64, copy=False)
        ids_a = left["_id"].to_numpy()
        ids_b = right["_id"].to_numpy()
        na = np.sqrt((la * la).sum(axis=1))
        nb = np.sqrt((rb * rb).sum(axis=1))
        cos = np.round((la @ rb.T) / np.outer(na, nb), 6)
        ia, ib = np.where(cos >= thr)
        if same:
            # symmetric matrix: keep each unordered pair once, skip diagonal
            keep = ids_a[ia] < ids_b[ib]
            ia, ib = ia[keep], ib[keep]
            a, b = ids_a[ia], ids_b[ib]
        else:
            # each unordered pair appears once in this (bi,bj) group, but the
            # smaller id may sit on either side — canonicalize to (min,max)
            a = np.minimum(ids_a[ia], ids_b[ib])
            b = np.maximum(ids_a[ia], ids_b[ib])
        return pd.DataFrame({"id_a": a, "id_b": b, "cosine": cos[ia, ib]})

    return tagged.groupBy("bi", "bj").applyInPandas(
        score_block, schema="id_a long, id_b long, cosine double"
    )


def embedding_near_dup_pairs_expr(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Expression-only variant of ``embedding_near_dup_pairs`` (no Python
    boundary at all) — prefer the blocked path for large inputs."""
    # Precompute each row's norm once (|n| traversals) instead of per pair
    # (|n^2| traversals); the pair expression is then a single dot product.
    l = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
        V.l2_norm(vec_col).alias("_na"),
    )
    r = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
        V.l2_norm(vec_col).alias("_nb"),
    )
    cos = F.round(V.dot("_va", "_vb") / (F.col("_na") * F.col("_nb")), 6)
    return (
        l.join(r, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-substring removal (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — the ExactSubstr step):
    every window of ``window_tokens`` consecutive tokens whose text occurs
    at least ``min_count`` times ANYWHERE in the corpus is cut from every
    document, and the surviving tokens rejoin in order.  This is the
    sub-document step below document/paragraph dedup: boilerplate, license
    blocks, and templated passages repeat verbatim inside otherwise-unique
    pages, and training on them measurably hurts LMs (the paper's result).

    Distributed shape (the paper uses a single-machine suffix array; this
    is the shuffle-bounded Spark rendition):

    1. map-side: tokenize, slide all n-L+1 windows per doc, double-hash
       each window's joined text (two independent xxhash64 seeds -> 128
       collision bits; a collision needs BOTH to collide on different
       text, so a false cut is vanishingly rare and merely drops one
       span).  Only (doc_id, pos, h1, h2) ever leaves the map side —
       never window text (x50 the corpus otherwise).
    2. ONE count shuffle on (h1, h2): repeated windows partial-aggregate
       map-side (the heavy boilerplate case collapses before the wire);
       unique windows — the common case — ride through once.
    3. left-semi join windows against the >=min_count set on (h1, h2)
       [AQE co-partitions with the count shuffle; a mega-duplicated
       window is a hot key here — AQE skew-join splits it].
    4. per doc: collect duplicated window starts (small), merge them into
       disjoint covered intervals (sorted same-length spans merge with one
       predecessor comparison each), and rebuild the text by slicing the
       UNCOVERED gaps between intervals — O(tokens + spans) pure
       expressions (a fully self-duplicated doc merges to ONE interval),
       one narrow shuffle on doc_id.

    Cost honesty: step 1 hashes O(n_tokens x L) bytes (map-parallel CPU,
    no shuffle amplification) and step 2 shuffles ~one row per corpus
    token.  That is the price of EXACT all-position matching without the
    paper's offline suffix array; run it after document/paragraph dedup
    has shrunk the corpus.  Tokenization uses the oracle-portable
    single-space split (``text.tokens``), so the full output is
    DuckDB-reproducible by grouping window TEXT (the hashes are a shuffle
    optimization, not a semantic).

    Removal semantics: ALL occurrences of a duplicated window are cut
    (the conservative published variant — C4 and the paper's released
    tool drop matched spans wherever they occur).  Docs whose tokens are
    all cut (or NULL text) come back with text='' rather than vanishing
    (the ``paragraph_dedup`` contract).  Returns (id_col, text_col,
    n_tokens_kept, n_tokens_removed, n_dup_spans).
    """
    from .text import tokens as _toks

    if window_tokens < 2:
        raise ValueError(f"window_tokens must be >= 2, got {window_tokens}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    L = window_tokens
    sep = "\x1f"  # cannot appear between tokens post-split; a token
    # containing \x1f could alias a boundary — both hashes see the same
    # joined string, so the (rare) consequence is one falsely-cut span

    tok = _toks(text_col)
    n = F.size(tok)
    starts = F.when(n >= L, F.sequence(F.lit(0), n - L)).otherwise(
        F.array().cast("array<int>")
    )
    wins = df.select(
        F.col(id_col),
        F.explode(starts).alias("_pos"),
        tok.alias("_t"),
    ).select(
        id_col,
        "_pos",
        F.xxhash64(F.array_join(F.slice("_t", F.col("_pos") + 1, L), sep)).alias("_h1"),
        F.xxhash64(
            F.lit("xsub2"), F.array_join(F.slice("_t", F.col("_pos") + 1, L), sep)
        ).alias("_h2"),
    )
    dup_keys = (
        wins.groupBy("_h1", "_h2")
        .agg(F.count("*").alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("_h1", "_h2")
    )
    dup_starts = (
        wins.join(dup_keys, ["_h1", "_h2"], "left_semi")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("_pos")).alias("_dup_starts"))
    )
    out = df.join(dup_starts, id_col, "left").withColumn(
        "_dup_starts", F.coalesce("_dup_starts", F.array().cast("array<int>"))
    )
    tok2 = _toks(text_col)
    # Interval-union rebuild, O(tokens + spans): starts are sorted and all
    # spans share length L, so a start opens a NEW covered interval iff it
    # sits more than L past its immediate predecessor (the running
    # interval's hi always tracks the last start).  Kept text = the gaps
    # between merged intervals, sliced straight out of the token array —
    # a pathologically self-duplicated doc merges to ONE interval instead
    # of exploding into per-position F.exists probes (O(tokens × spans)).
    s_arr = F.col("_dup_starts")
    heads = F.filter(
        s_arr,
        lambda s, i: F.when(i == 0, F.lit(True)).otherwise(
            # 1-based element i == 0-based predecessor of i
            (s - F.element_at(s_arr, i)) > F.lit(L)
        ),
    )
    tails = F.filter(
        s_arr,
        lambda s, i: F.when(i == F.size(s_arr) - 1, F.lit(True)).otherwise(
            (F.element_at(s_arr, i + 2) - s) > F.lit(L)
        ),
    )
    ranges = F.zip_with(
        heads, tails, lambda lo, t: F.struct(lo.alias("lo"), (t + L).alias("hi"))
    )
    n2 = F.size(tok2)
    gaps = F.transform(
        F.sequence(F.lit(0), F.size(ranges)),
        lambda j: F.struct(
            F.when(j == 0, F.lit(0))
            .otherwise(F.element_at(ranges, j)["hi"])
            .alias("lo"),
            F.when(j == F.size(ranges), n2)
            .otherwise(F.element_at(ranges, j + 1)["lo"])
            .alias("hi"),
        ),
    )
    # NB: gaps/kept are materialized as named columns, NOT inlined into
    # each output expression — duplicating this nested-HOF tree across
    # select items trips a Catalyst mis-evaluation (size() of the
    # duplicated copy came back wrong while array_join of its twin was
    # right; single-instance column references are immune).
    kept = F.flatten(
        F.transform(
            F.col("_gaps"),
            lambda g: F.when(
                g["hi"] > g["lo"],
                F.slice(tok2, g["lo"] + 1, g["hi"] - g["lo"]),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    return (
        out.withColumn("_gaps", gaps)
        .withColumn("_kept", kept)
        .select(
            id_col,
            F.coalesce(F.array_join("_kept", " "), F.lit("")).alias(text_col),
            F.coalesce(F.size("_kept"), F.lit(0)).alias("n_tokens_kept"),
            F.coalesce(F.size(tok2) - F.size("_kept"), F.lit(0)).alias(
                "n_tokens_removed"
            ),
            F.size("_dup_starts").alias("n_dup_spans"),
        )
    )
