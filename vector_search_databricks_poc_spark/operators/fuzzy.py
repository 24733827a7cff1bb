"""Fuzzy (edit-distance) joins and dedup — entity resolution over noisy keys.

A training-data pipeline constantly reconciles noisy string keys: OCR'd
titles, typo'd author names, crawl-mangled product names.  The scalable
rendition of "join where levenshtein(a, b) <= d" is candidate generation
by *deletion-neighborhood blocking* (the SymSpell idea, Garbe 2012;
completeness follows from FastSS, Bocek et al. 2007): if
``ed(a, b) <= d`` then deleting at most ``d`` characters from each of
``a`` and ``b`` can produce a common string — take any optimal edit
script with s substitutions, i insertions (into a), e deletions
(s+i+e <= d); deleting the substituted+deleted positions from ``a``
(<= s+e) and the substituted+inserted positions from ``b`` (<= s+i)
yields the same string.  So blocking on the <= d-deletion neighborhood
finds EVERY true pair; an exact ``levenshtein`` verify removes the false
candidates.

Spark-first shape (no Python in the hot path):

- the neighborhood is a nested higher-order-function expression
  (``transform(sequence(...))`` + one ``explode``) — JVM-side with zero
  Python, though NOT whole-stage-codegen'd: ``Generate`` and nested HOF
  lambdas evaluate interpreted (PLANS.md records ``codegen_spans: 0``),
  an acceptable constant at name-like key lengths because the
  ZERO-exchange broadcast shape is what matters at scale;
- candidates = one equi-join on the neighborhood key (broadcastable when
  one side is a small canonical catalog);
- verify = ``levenshtein(a, b, threshold=d)`` — Spark's threshold form
  short-circuits the DP once the band exceeds ``d`` (O(d*min_len)).

Shuffle budget: EXPLODE (map-side, x ~len^d rows) -> join (1 exchange,
or 0 with a broadcast catalog) -> pair dedup (1 exchange).  Neighborhood
size is C(len, d)+..., so this operator targets *name-like* strings —
len <= 64 at d=1, <= 32 at d=2, ENFORCED: an over-length key (a document
pasted into the key column would otherwise silently explode ~len^d
candidate rows) raises executor-side via ``raise_error`` before the
explode, the same contract class as the ``max_distance`` > 2 guard;
callers with longer trusted keys can raise ``max_len`` explicitly.

At 100 TB: the dirty side streams through the explode+join map-side when
the catalog broadcasts; for big-big fuzzy joins both sides shuffle once
on the deletion key, and pair-dedup is proportional to the candidate set
(bounded by neighborhood overlap, not |L| x |R|).

The reference has no fuzzy matching (its ids are exact,
/root/reference/src/databricks/syntetic_data.py:55-66); this is part of
the mandated entity-resolution/text-analysis extension surface
(SURVEY.md SS2B).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .components import connected_components

__all__ = [
    "deletion_neighborhood",
    "fuzzy_join",
    "fuzzy_self_pairs",
    "fuzzy_dedup",
    "fuzzy_key_store",
    "incremental_fuzzy_match",
]


def _deletes_expr(s: str) -> str:
    """SQL for the 1-deletion set of string expression ``s`` (plus ``s``
    itself).  Empty strings short-circuit (sequence(1,0) would descend)."""
    one_del = (
        f"transform(sequence(1, length({s})), i -> "
        f"concat(substring({s}, 1, i - 1), substring({s}, i + 1, 2147483647)))"
    )
    return f"case when length({s}) = 0 then array({s}) else array_union(array({s}), {one_del}) end"


def deletion_neighborhood(
    col: str, max_distance: int = 1, max_len: int | None = None
) -> Column:
    """``array<string>`` of every string reachable from ``col`` by at most
    ``max_distance`` deletions (including ``col`` itself), distinct.

    Pure nested-HOF expression — JVM-side, no UDF (interpreted, not
    WSCG'd: ``Generate``/HOF lambdas fall out of codegen, see module
    docstring).  ``max_len`` (default 64 at d=1, 32 at d=2) bounds the
    ~len^d blow-up: an over-length key raises executor-side instead of
    silently exploding — pass a larger value only for trusted key
    domains."""
    if max_distance not in (1, 2):
        raise ValueError(f"max_distance must be 1 or 2, got {max_distance}")
    if max_len is None:
        max_len = 64 if max_distance == 1 else 32
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    keys = _deletes_expr(col)
    if max_distance == 2:
        keys = f"array_distinct(flatten(transform({keys}, k0 -> {_deletes_expr('k0')})))"
    guarded = (
        f"case when length({col}) > {int(max_len)} then "
        f"raise_error(concat('fuzzy key length ', length({col}), "
        f"' exceeds max_len={int(max_len)} (deletion neighborhood is "
        f"~len^{max_distance} keys); raise max_len for trusted key "
        f"domains')) else {keys} end"
    )
    return F.expr(guarded)


def _verified(cand: DataFrame, left_col: str, right_col: str, d: int) -> DataFrame:
    # threshold form returns -1 when the distance exceeds d: one banded DP.
    dist = F.levenshtein(F.col(left_col), F.col(right_col), d)
    return cand.withColumn("dist", dist).where(F.col("dist") >= 0)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
    max_distance: int = 1,
    broadcast_right: bool = False,
    max_len: int | None = None,
) -> DataFrame:
    """All (left, right) row pairs with ``levenshtein <= max_distance``.

    Returns ``left_id, left_col, right_id, right_col, dist``.  Column
    names must be disjoint across the two inputs for the carried columns.
    ``broadcast_right=True`` for a small canonical catalog: the join then
    has ZERO exchanges (explode is map-side) and the dirty side never
    shuffles.
    """
    lk = left.select(left_id, left_col).withColumn(
        "_fk", F.explode(deletion_neighborhood(left_col, max_distance, max_len))
    )
    rk = right.select(right_id, right_col).withColumn(
        "_fk", F.explode(deletion_neighborhood(right_col, max_distance, max_len))
    )
    if broadcast_right:
        rk = F.broadcast(rk)
    # full-row distinct, not dropDuplicates([ids]): the value columns are
    # functionally dependent on the ids (same source row), and a pure
    # group-by plans as HashAggregate where dropDuplicates' first() agg
    # falls back to SortAggregate
    cand = lk.join(rk, "_fk").drop("_fk").distinct()
    return _verified(cand, left_col, right_col, max_distance)


def fuzzy_self_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    max_distance: int = 1,
    broadcast: bool = False,
    max_len: int | None = None,
) -> DataFrame:
    """Unordered within-table pairs (id_a < id_b) with edit distance
    <= ``max_distance``.  Output: ``id_a, val_a, id_b, val_b, dist``.

    ``broadcast=True`` broadcasts one side of the self-join — right for
    batch-sized inputs (the incremental path); the default shuffling join
    is the big-corpus shape."""
    keyed = df.select(
        F.col(id_col).alias("_fid"), F.col(col).alias("_fval")
    ).withColumn("_fk", F.explode(deletion_neighborhood("_fval", max_distance, max_len)))
    a = keyed.select(
        F.col("_fid").alias("id_a"), F.col("_fval").alias("val_a"), "_fk"
    )
    b = keyed.select(
        F.col("_fid").alias("id_b"), F.col("_fval").alias("val_b"), "_fk"
    )
    cand = (
        a.join(F.broadcast(b) if broadcast else b, "_fk")
        .where(F.col("id_a") < F.col("id_b"))
        .drop("_fk")
        .distinct()  # values functionally dependent on ids: HashAggregate
    )
    return _verified(cand, "val_a", "val_b", max_distance)


def fuzzy_dedup(
    df: DataFrame,
    col: str,
    id_col: str,
    max_distance: int = 1,
    max_iter: int = 20,
    max_len: int | None = None,
) -> DataFrame:
    """Canonicalize near-identical string keys: connected components over
    the fuzzy pair graph, canonical = the value of the min-id member.

    Returns one row per input row: ``<id_col>, <col>, canonical_id,
    canonical_<col>`` — singletons map to themselves.  Same iterative
    label-propagation contract as dedup clustering (components.py):
    the per-round convergence count is the algorithm, so this operator
    is eager by contract.
    """
    pairs = fuzzy_self_pairs(df, col, id_col, max_distance, max_len=max_len)
    comp = connected_components(pairs, src="id_a", dst="id_b", max_iter=max_iter)
    base = df.select(F.col(id_col), F.col(col))
    labeled = base.join(
        comp.withColumnRenamed("node", id_col), on=id_col, how="left"
    ).withColumn("canonical_id", F.coalesce("component", F.col(id_col))).drop(
        "component"
    )
    canon = base.select(
        F.col(id_col).alias("canonical_id"), F.col(col).alias(f"canonical_{col}")
    )
    # plain equi-join on the id: the canonical side is the full table (any
    # row can be a singleton's own canonical), so it must NOT broadcast.
    return labeled.join(canon, on="canonical_id", how="left").select(
        id_col, col, "canonical_id", f"canonical_{col}"
    )


def fuzzy_key_store(
    df: DataFrame,
    col: str,
    id_col: str,
    max_distance: int = 1,
    max_len: int | None = None,
) -> DataFrame:
    """Persistable deletion-key store for incremental fuzzy matching:
    one row per (id, value, deletion key).  Write this once per admitted
    batch (append-only); new batches probe it without re-keying history
    — the same store contract as the MinHash signature store
    (dedup.py::incremental_minhash_near_dup).

    ~len^d rows per key at rest; the value rides along so the verify
    step never reads the historical source table (fuzzy keys are short
    by contract, unlike document text)."""
    return df.select(
        F.col(id_col).alias("store_id"), F.col(col).alias("store_val")
    ).withColumn(
        "_fk", F.explode(deletion_neighborhood("store_val", max_distance, max_len))
    )


def incremental_fuzzy_match(
    new_df: DataFrame,
    store: DataFrame,
    col: str,
    id_col: str,
    max_distance: int = 1,
    max_len: int | None = None,
) -> DataFrame:
    """Fuzzy matches of a NEW batch against a persisted key store plus
    within the batch itself, touching nothing historical beyond the
    store scan.

    Returns (id_a, id_b, val_a, val_b, dist, origin): origin='new_old'
    pairs a new id (id_a) with a store id (id_b); origin='new_new' pairs
    two new ids (id_a < id_b).  Exactness contract: equals
    fuzzy_self_pairs over (historical ∪ new) restricted to pairs
    touching the new batch (asserted in tests).  Id spaces must be
    disjoint across batches.

    100 TB shape: the new batch's keys BROADCAST into the store join, so
    the store streams past map-side with no shuffle; the only exchanges
    are the candidate-pair dedups (batch-sized)."""
    new_keyed = (
        new_df.select(F.col(id_col).alias("new_id"), F.col(col).alias("new_val"))
        .withColumn(
            "_fk", F.explode(deletion_neighborhood("new_val", max_distance, max_len))
        )
        .localCheckpoint(eager=False)
    )
    cross = (
        store.join(F.broadcast(new_keyed), "_fk")
        .select(
            F.col("new_id").alias("id_a"),
            F.col("store_id").alias("id_b"),
            F.col("new_val").alias("val_a"),
            F.col("store_val").alias("val_b"),
        )
        .distinct()  # values functionally dependent on ids: HashAggregate
    )
    intra = fuzzy_self_pairs(
        new_df, col, id_col, max_distance, broadcast=True, max_len=max_len
    )
    return _verified(cross, "val_a", "val_b", max_distance).withColumn(
        "origin", F.lit("new_old")
    ).unionByName(intra.withColumn("origin", F.lit("new_new")))
