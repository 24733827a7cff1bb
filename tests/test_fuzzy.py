"""Fuzzy (edit-distance) join/dedup: blocking completeness vs brute force.

The SymSpell/FastSS deletion-neighborhood guarantee (fuzzy.py docstring)
is the load-bearing claim: every true pair must survive blocking.  These
tests prove it exhaustively — Spark's blocked result is compared against
an all-pairs DuckDB levenshtein brute force on the same inputs — and pin
the plan shape (broadcast catalog => the only exchange is the pair dedup).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection
from vector_search_databricks_poc_spark.operators.fuzzy import (
    deletion_neighborhood,
    fuzzy_dedup,
    fuzzy_join,
    fuzzy_self_pairs,
)
from vector_search_databricks_poc_spark.plans import audit


def _neighborhood(spark, s: str, d: int) -> list[str]:
    row = spark.range(1).select(
        deletion_neighborhood(f"'{s}'", max_distance=d).alias("n")
    ).first()
    return sorted(row["n"])


def test_neighborhood_d1(spark):
    assert _neighborhood(spark, "abc", 1) == sorted(["abc", "bc", "ac", "ab"])


def test_neighborhood_d2_contains_all_two_deletions(spark):
    got = set(_neighborhood(spark, "abcd", 2))
    import itertools

    want = set()
    for keep in range(2, 5):
        for idx in itertools.combinations(range(4), keep):
            want.add("".join("abcd"[i] for i in idx))
    assert want <= got


def test_neighborhood_empty_string(spark):
    assert _neighborhood(spark, "", 1) == [""]
    assert _neighborhood(spark, "", 2) == [""]


def test_neighborhood_rejects_large_distance(spark):
    with pytest.raises(ValueError):
        deletion_neighborhood("x", max_distance=3)


@pytest.mark.parametrize("d", [1, 2])
def test_self_pairs_match_brute_force(spark, d):
    """Blocked self-pairs == exhaustive all-pairs levenshtein (DuckDB).

    The corpus mixes true near-matches (planted deletions/substitutions)
    with unrelated names, at both distances.
    """
    words = [
        "spark", "spar", "sprk", "shark", "sharks", "quark",
        "table", "tale", "tables", "fable", "cable", "cab",
        "", "a", "b", "ab",
    ]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["wid", "word"]
    )
    got = fuzzy_self_pairs(df, col="word", id_col="wid", max_distance=d)
    con = duck_connection(SF_DIR)
    con.execute("CREATE OR REPLACE TABLE words(wid BIGINT, word VARCHAR)")
    con.executemany(
        "INSERT INTO words VALUES (?, ?)", [(i, w) for i, w in enumerate(words)]
    )
    sql = f"""
    SELECT a.wid AS id_a, a.word AS val_a, b.wid AS id_b, b.word AS val_b,
           CAST(levenshtein(a.word, b.word) AS INT) AS dist
    FROM words a JOIN words b ON a.wid < b.wid
    WHERE levenshtein(a.word, b.word) <= {d}
    """
    r = compare(got, con, sql)
    assert r["values_match"], r


def test_fuzzy_join_broadcast_plan(spark):
    """Catalog-broadcast fuzzy join: zero shuffles except the pair dedup,
    and the join is a BroadcastHashJoin on the deletion key."""
    from vector_search_databricks_poc_spark.catalog import load_table

    part = load_table(spark, SF_DIR, "part")
    dirty = part.select(
        F.col("p_partkey").alias("did"), F.col("p_name").alias("dname")
    )
    catalog = part.groupBy("p_name").agg(F.min("p_partkey").alias("cid"))
    out = fuzzy_join(
        dirty, catalog, "dname", "p_name", "did", "cid",
        max_distance=1, broadcast_right=True,
    )
    assert audit.uses_broadcast_join(out)
    # catalog agg (1) + pair dedup (1); the dirty side itself never shuffles
    assert audit.count_exchanges(out) <= 2


def test_fuzzy_dedup_singletons_and_clusters(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alpa"), (3, "omega"), (4, "alpha")],
        ["nid", "name"],
    )
    out = fuzzy_dedup(df, col="name", id_col="nid", max_distance=1)
    rows = {r["nid"]: (r["canonical_id"], r["canonical_name"]) for r in out.collect()}
    assert rows[1] == (1, "alpha")
    assert rows[2] == (1, "alpha")
    assert rows[4] == (1, "alpha")
    assert rows[3] == (3, "omega")  # singleton maps to itself


def test_incremental_matches_one_shot_restricted(spark):
    """Store-probe incremental fuzzy match == one-shot self-pairs over
    (historical ∪ new) restricted to pairs touching the new batch."""
    from vector_search_databricks_poc_spark.operators.fuzzy import (
        fuzzy_key_store,
        incremental_fuzzy_match,
    )

    hist = [(1, "spark"), (2, "table"), (3, "cable"), (4, "quartz")]
    new = [(101, "spar"), (102, "tale"), (103, "spa"), (104, "tble")]
    hist_df = spark.createDataFrame(hist, ["kid", "key"])
    new_df = spark.createDataFrame(new, ["kid", "key"])

    store = fuzzy_key_store(hist_df, col="key", id_col="kid", max_distance=1)
    inc = incremental_fuzzy_match(
        new_df, store, col="key", id_col="kid", max_distance=1
    ).collect()

    union = hist_df.unionByName(new_df)
    one_shot = fuzzy_self_pairs(union, col="key", id_col="kid", max_distance=1)
    new_ids = {k for k, _ in new}
    want = set()
    for r in one_shot.collect():
        a, b = r["id_a"], r["id_b"]
        if a in new_ids and b in new_ids:
            want.add((a, b, r["dist"], "new_new"))
        elif b in new_ids and a not in new_ids:
            want.add((b, a, r["dist"], "new_old"))  # new id first
        elif a in new_ids and b not in new_ids:
            want.add((a, b, r["dist"], "new_old"))
    got = {(r["id_a"], r["id_b"], r["dist"], r["origin"]) for r in inc}
    assert got == want, (sorted(got), sorted(want))


def test_incremental_store_never_shuffles(spark):
    """The store side of the probe join must sit behind the broadcast —
    only batch-sized pair dedups may exchange."""
    from vector_search_databricks_poc_spark.operators.fuzzy import (
        fuzzy_key_store,
        incremental_fuzzy_match,
    )

    hist_df = spark.createDataFrame([(i, f"name{i}") for i in range(50)], ["kid", "key"])
    new_df = spark.createDataFrame([(100, "name1x")], ["kid", "key"])
    store = fuzzy_key_store(hist_df, col="key", id_col="kid")
    out = incremental_fuzzy_match(new_df, store, col="key", id_col="kid")
    assert audit.uses_broadcast_join(out)
    assert audit.count_exchanges(out) <= 2  # the two pair dedups


def test_neighborhood_over_length_raises(spark):
    """ADVICE r7: a document pasted into the key column must raise, not
    silently explode ~len^d candidate rows (same contract class as the
    max_distance > 2 guard)."""
    from pyspark.errors import PySparkException

    long_key = "x" * 65
    df = spark.createDataFrame([(1, long_key)], "id long, k string")
    with pytest.raises(PySparkException, match="max_len"):
        df.select(deletion_neighborhood("k", 1).alias("n")).collect()
    # d=2 regime is tighter (32)
    df2 = spark.createDataFrame([(1, "y" * 33)], "id long, k string")
    with pytest.raises(PySparkException, match="max_len"):
        df2.select(deletion_neighborhood("k", 2).alias("n")).collect()


def test_neighborhood_boundary_and_override(spark):
    # exactly at the bound: fine
    df = spark.createDataFrame([(1, "x" * 64)], "id long, k string")
    row = df.select(F.size(deletion_neighborhood("k", 1)).alias("n")).first()
    assert row["n"] == 2  # all single deletions of x^64 collapse to x^63
    # trusted-domain override admits longer keys
    df2 = spark.createDataFrame([(1, "x" * 65)], "id long, k string")
    row2 = df2.select(
        F.size(deletion_neighborhood("k", 1, max_len=80)).alias("n")
    ).first()
    assert row2["n"] == 2
    with pytest.raises(ValueError):
        deletion_neighborhood("k", 1, max_len=0)


def test_fuzzy_join_over_length_raises(spark):
    from pyspark.errors import PySparkException
    from vector_search_databricks_poc_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame([(1, "d" * 100)], "lid long, lval string")
    right = spark.createDataFrame([(2, "name")], "rid long, rval string")
    out = fuzzy_join(left, right, "lval", "rval", "lid", "rid", 1, True)
    with pytest.raises(PySparkException, match="max_len"):
        out.collect()
