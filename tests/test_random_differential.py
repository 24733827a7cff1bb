"""Seeded randomized differential testing against DuckDB.

The registry's 50 oracle queries pin down hand-picked plans; this harness
pins down the *translation rules themselves*: each seeded spec is rendered
BOTH as a DataFrame-API plan (the way every registry query is built) and as
the equivalent ANSI SQL, then executed on Spark and DuckDB over the same
parquet fixture and compared cell-by-cell with numeric tolerance.  A
divergence here means a semantics bug in how we express group-bys, HAVING,
conditional aggregation, ROLLUP/CUBE, window frames, order/limit, joins
(inner/left/semi/anti vs ANSI JOIN/EXISTS), set operations, or scalar
expressions — the exact failure class a fixed query set can miss
(hypothesis-randomized as-of/interval join semantics vs Python references
live in tests/test_properties.py).  The set-op axis already earned its
keep: it caught `exceptAll().distinct()` being used where SQL EXCEPT
means `subtract()` — visible only because the fixture contains duplicate
rows.

Specs are generated from fixed seeds so failures reproduce; constants come
from the fixture's real value domains (TESTDATA.md) so predicates hit
meaningful selectivities instead of always-empty or always-full scans.
"""

from __future__ import annotations

import datetime
import math
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.oracle_utils import duck_connection

# --------------------------------------------------------------------------
# table metadata: group-able columns, numeric columns, unique row key,
# timestamp column, and a predicate pool rendered as (sql, builder)
# --------------------------------------------------------------------------

TABLES = {
    "orders": {
        "group": ["o_orderstatus", "o_orderpriority"],
        "nums": ["o_totalprice"],
        "key": ["o_orderkey"],
        "ts": "o_orderdate",
        "preds": [
            ("o_totalprice >= 250000", lambda: F.col("o_totalprice") >= 250000),
            ("o_orderstatus = 'O'", lambda: F.col("o_orderstatus") == "O"),
            (
                "o_orderpriority IN ('1-URGENT', '2-HIGH')",
                lambda: F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            ),
            (
                "o_orderdate < TIMESTAMP '1998-01-01 00:00:00'",
                lambda: F.col("o_orderdate")
                < F.to_timestamp(F.lit("1998-01-01 00:00:00")),
            ),
        ],
    },
    "lineitem": {
        "group": ["l_returnflag", "l_linestatus", "l_linenumber"],
        "nums": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "key": ["l_orderkey", "l_linenumber"],
        "ts": "l_shipdate",
        "preds": [
            (
                "l_quantity BETWEEN 10 AND 40",
                lambda: F.col("l_quantity").between(10, 40),
            ),
            ("l_discount >= 0.05", lambda: F.col("l_discount") >= 0.05),
            ("l_returnflag <> 'N'", lambda: F.col("l_returnflag") != "N"),
            (
                "l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'",
                lambda: F.col("l_shipdate")
                >= F.to_timestamp(F.lit("1997-06-01 00:00:00")),
            ),
        ],
    },
    "events": {
        "group": ["event_type"],
        "nums": ["value"],
        "key": ["event_id"],
        "ts": "ts",
        "preds": [
            ("value > 50", lambda: F.col("value") > 50),
            (
                "event_type IN ('view', 'click')",
                lambda: F.col("event_type").isin("view", "click"),
            ),
            (
                "ts < TIMESTAMP '2024-01-15 00:00:00'",
                lambda: F.to_timestamp(F.col("ts"))
                < F.to_timestamp(F.lit("2024-01-15 00:00:00")),
            ),
        ],
    },
}


def _load(spark, table):
    return spark.read.parquet(f"{SF_DIR}/{table}.parquet")


# --------------------------------------------------------------------------
# tolerant comparison: rows aligned on exact key columns, numeric cells
# compared with isclose (double sums differ in the last ulps between
# engines by associativity; everything else must match exactly)
# --------------------------------------------------------------------------


def _cell_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-8, abs_tol=1e-8)
    if isinstance(a, datetime.datetime) or isinstance(b, datetime.datetime):
        return a == b
    return str(a) == str(b)


def _sort_norm(v):
    """Row-alignment sort key: exact for non-floats, rounded to 6
    significant digits for floats so engine-side 1e-12 jitter in computed
    columns can't reorder the alignment (values are then compared with
    the tighter _cell_eq tolerance)."""
    if isinstance(v, float):
        return f"{v:.6e}"
    return str(v)


def assert_equivalent(spark_df, con, sql: str, key_cols: list[str], spec: str):
    cols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    dcols = list(rel.columns)
    assert sorted(cols) == sorted(dcols), f"{spec}: cols {cols} vs {dcols}"
    perm = [dcols.index(c) for c in cols]
    drows = [tuple(r[i] for i in perm) for r in rel.fetchall()]
    assert len(srows) == len(drows), (
        f"{spec}: row count {len(srows)} vs {len(drows)}"
    )
    kidx = [cols.index(k) for k in key_cols]
    rest = [i for i in range(len(cols)) if i not in kidx]

    # align on keys first, then on the remaining (normalized) cells —
    # the fixture's "natural keys" are NOT unique (duplicate
    # (l_orderkey, l_linenumber) pairs exist by construction), so rows
    # sharing a key are paired by value multiset, not by position
    def skey(row):
        return (
            tuple(_sort_norm(row[i]) for i in kidx)
            + tuple(_sort_norm(row[i]) for i in rest)
        )

    srows.sort(key=skey)
    drows.sort(key=skey)
    for a, b in zip(srows, drows):
        for c, (x, y) in zip(cols, zip(a, b)):
            assert _cell_eq(x, y), (
                f"{spec}: column {c} diverges: spark={x!r} duck={y!r}\n"
                f"  spark row {a}\n  duck  row {b}\n  sql: {sql}"
            )


# --------------------------------------------------------------------------
# spec generators
# --------------------------------------------------------------------------


def _agg_pool(meta, rng):
    """(alias, spark Column, sql fragment) candidates for one table."""
    n = rng.choice(meta["nums"])
    ts = meta["ts"]
    psql, pcol = rng.choice(meta["preds"])
    return [
        ("cnt", F.count(F.lit(1)).alias("cnt"), "COUNT(*) AS cnt"),
        (
            f"cntd_{meta['group'][0]}",
            F.countDistinct(meta["group"][0]).alias(f"cntd_{meta['group'][0]}"),
            f"COUNT(DISTINCT {meta['group'][0]}) AS cntd_{meta['group'][0]}",
        ),
        (f"sum_{n}", F.sum(n).alias(f"sum_{n}"), f"SUM({n}) AS sum_{n}"),
        (f"min_{n}", F.min(n).alias(f"min_{n}"), f"MIN({n}) AS min_{n}"),
        (f"max_{n}", F.max(n).alias(f"max_{n}"), f"MAX({n}) AS max_{n}"),
        (f"avg_{n}", F.avg(n).alias(f"avg_{n}"), f"AVG({n}) AS avg_{n}"),
        (f"min_{ts}", F.min(ts).alias(f"min_{ts}"), f"MIN({ts}) AS min_{ts}"),
        (
            f"csum_{n}",
            F.sum(F.when(pcol(), F.col(n)).otherwise(F.lit(0.0))).alias(
                f"csum_{n}"
            ),
            f"SUM(CASE WHEN {psql} THEN {n} ELSE 0 END) AS csum_{n}",
        ),
    ]


@pytest.mark.parametrize("seed", range(12))
def test_random_grouped_aggregates_match_duckdb(spark, seed):
    rng = random.Random(1000 + seed)
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    keys = rng.sample(meta["group"], rng.randint(0, min(2, len(meta["group"]))))

    pool = _agg_pool(meta, rng)
    picked, seen = [], set()
    for a in rng.sample(pool, rng.randint(2, 4)):
        if a[0] not in seen:
            seen.add(a[0])
            picked.append(a)
    use_pred = rng.random() < 0.6
    psql, pcol = rng.choice(meta["preds"])
    use_having = bool(keys) and rng.random() < 0.4
    if use_having and "cnt" not in seen:
        picked.append(pool[0])

    df = _load(spark, table)
    if use_pred:
        df = df.where(pcol())
    gdf = df.groupBy(*keys).agg(*[c for _, c, _ in picked]) if keys else df.agg(
        *[c for _, c, _ in picked]
    )
    if use_having:
        gdf = gdf.where(F.col("cnt") > 3)

    sel = ", ".join([*keys, *[frag for _, _, frag in picked]])
    sql = f"SELECT {sel} FROM {table}"
    if use_pred:
        sql += f" WHERE {psql}"
    if keys:
        sql += f" GROUP BY {', '.join(keys)}"
    if use_having:
        sql += " HAVING COUNT(*) > 3"

    con = duck_connection(SF_DIR)
    try:
        assert_equivalent(gdf, con, sql, keys, f"agg seed={seed} {table}")
    finally:
        con.close()


@pytest.mark.parametrize("seed", range(6))
def test_random_rollup_cube_match_duckdb(spark, seed):
    """Multi-level aggregation (ROLLUP / CUBE) — the super-aggregate rows'
    NULL markers and values must agree between the DataFrame API and
    DuckDB's ANSI GROUP BY ROLLUP/CUBE."""
    rng = random.Random(4000 + seed)
    table = rng.choice(["orders", "lineitem"])
    meta = TABLES[table]
    keys = rng.sample(meta["group"], 2)
    n = rng.choice(meta["nums"])
    mode = rng.choice(["rollup", "cube"])

    df = _load(spark, table)
    grouped = df.rollup(*keys) if mode == "rollup" else df.cube(*keys)
    out = grouped.agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(n).alias(f"sum_{n}")
    )

    sql = (
        f"SELECT {', '.join(keys)}, COUNT(*) AS cnt, SUM({n}) AS sum_{n} "
        f"FROM {table} GROUP BY {mode.upper()} ({', '.join(keys)})"
    )
    con = duck_connection(SF_DIR)
    try:
        assert_equivalent(out, con, sql, keys, f"{mode} seed={seed} {table}")
    finally:
        con.close()


WINDOW_FUNCS = [
    # (name, needs_tiebreak, spark builder, sql template)
    ("row_number", True, lambda n: F.row_number(), "ROW_NUMBER()"),
    ("rank", False, lambda n: F.rank(), "RANK()"),
    ("dense_rank", False, lambda n: F.dense_rank(), "DENSE_RANK()"),
    ("lag1", True, lambda n: F.lag(n, 1), "LAG({n}, 1)"),
    ("lead2", True, lambda n: F.lead(n, 2), "LEAD({n}, 2)"),
    (
        "runsum",
        True,
        lambda n: F.sum(n),
        "SUM({n})",
    ),
    (
        "movavg",
        True,
        lambda n: F.avg(n),
        "AVG({n})",
    ),
]


@pytest.mark.parametrize("seed", range(10))
def test_random_window_functions_match_duckdb(spark, seed):
    rng = random.Random(2000 + seed)
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    part = rng.choice(meta["group"])
    order = rng.choice([meta["ts"], *meta["nums"]])
    n = rng.choice(meta["nums"])
    fname, tie, fcol, ftmpl = rng.choice(WINDOW_FUNCS)

    # frame/offset-dependent functions need a TOTAL order: the fixture's
    # natural keys are not unique, so tie-break over EVERY column (rows
    # identical in all columns contribute identically, so the result
    # multiset stays deterministic)
    all_cols = _load(spark, table).columns
    order_cols = (
        [order, *[c for c in all_cols if c != order]] if tie else [order]
    )
    w = Window.partitionBy(part).orderBy(*[F.col(c).asc() for c in order_cols])
    frame_sql = ""
    if fname == "runsum":
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        frame_sql = " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    elif fname == "movavg":
        w = w.rowsBetween(-3, Window.currentRow)
        frame_sql = " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW"

    df = _load(spark, table).select(
        *meta["key"], fcol(n).over(w).alias("wval")
    )

    # Spark's asc() is NULLS FIRST; DuckDB defaults to NULLS LAST — pin it
    # explicitly so a future fixture with NULLs can't diverge silently
    over = (
        f"PARTITION BY {part} ORDER BY "
        + ", ".join(f"{c} ASC NULLS FIRST" for c in order_cols)
        + frame_sql
    )
    sql = (
        f"SELECT {', '.join(meta['key'])}, {ftmpl.format(n=n)} OVER ({over})"
        f" AS wval FROM {table}"
    )

    con = duck_connection(SF_DIR)
    try:
        assert_equivalent(
            df, con, sql, meta["key"], f"window seed={seed} {table} {fname}"
        )
    finally:
        con.close()


@pytest.mark.parametrize("seed", range(6))
def test_random_filter_topn_match_duckdb(spark, seed):
    rng = random.Random(3000 + seed)
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    n = rng.choice(meta["nums"])
    limit = rng.choice([5, 20, 100])
    use_pred = rng.random() < 0.5
    psql, pcol = rng.choice(meta["preds"])
    proj = [*meta["key"], n, meta["group"][0]]

    df = _load(spark, table)
    if use_pred:
        df = df.where(pcol())
    # tie-break over EVERY projected column: natural keys are not unique,
    # so only rows identical in the whole projection can tie at the LIMIT
    # boundary — and those are interchangeable
    ties = [c for c in proj if c != n]
    df = (
        df.select(*proj)
        .orderBy(F.col(n).desc(), *[F.col(c).asc() for c in ties])
        .limit(limit)
    )

    # pin NULL ordering to Spark's semantics (desc = NULLS LAST, asc =
    # NULLS FIRST); DuckDB's defaults are the opposite for ASC
    order = f"{n} DESC NULLS LAST, " + ", ".join(
        f"{c} ASC NULLS FIRST" for c in ties
    )
    sql = f"SELECT {', '.join(proj)} FROM {table}"
    if use_pred:
        sql += f" WHERE {psql}"
    sql += f" ORDER BY {order} LIMIT {limit}"

    con = duck_connection(SF_DIR)
    try:
        assert_equivalent(
            df, con, sql, meta["key"], f"topn seed={seed} {table}"
        )
    finally:
        con.close()


# --------------------------------------------------------------------------
# join axis: DataFrame-API joins (inner/left/semi/anti, with pushable
# side filters) vs ANSI joins / EXISTS in DuckDB
# --------------------------------------------------------------------------

JOIN_PAIRS = [
    # (left, right, left_key, right_key, left_cols, right_cols)
    ("orders", "customer", "o_custkey", "c_custkey",
     ["o_orderkey", "o_custkey", "o_orderstatus"], ["c_name", "c_nationkey"]),
    ("lineitem", "orders", "l_orderkey", "o_orderkey",
     ["l_orderkey", "l_linenumber", "l_quantity"], ["o_orderstatus", "o_orderpriority"]),
]


@pytest.mark.parametrize("seed", range(8))
def test_random_joins_match_duckdb(spark, seed):
    rng = random.Random(5000 + seed)
    lt, rt, lk, rk, lcols, rcols = rng.choice(JOIN_PAIRS)
    how = rng.choice(["inner", "left", "left_semi", "left_anti"])
    lpred = rng.choice([None, *TABLES[lt]["preds"]])
    rpred = rng.choice([None, *TABLES[rt]["preds"]]) if rt in TABLES else None

    ldf = _load(spark, lt)
    rdf = _load(spark, rt)
    if lpred:
        ldf = ldf.where(lpred[1]())
    if rpred:
        rdf = rdf.where(rpred[1]())
    joined = ldf.join(rdf, ldf[lk] == rdf[rk], how)
    proj = lcols if how in ("left_semi", "left_anti") else [*lcols, *rcols]
    out = joined.select(*proj)

    lw = f" WHERE {lpred[0]}" if lpred else ""
    rw = f" WHERE {rpred[0]}" if rpred else ""
    lsub = f"(SELECT * FROM {lt}{lw}) l"
    rsub = f"(SELECT * FROM {rt}{rw}) r"
    cols = ", ".join(proj)
    if how == "inner":
        sql = f"SELECT {cols} FROM {lsub} JOIN {rsub} ON l.{lk} = r.{rk}"
    elif how == "left":
        sql = f"SELECT {cols} FROM {lsub} LEFT JOIN {rsub} ON l.{lk} = r.{rk}"
    elif how == "left_semi":
        sql = (
            f"SELECT {cols} FROM {lsub} WHERE EXISTS "
            f"(SELECT 1 FROM {rsub} WHERE r.{rk} = l.{lk})"
        )
    else:
        sql = (
            f"SELECT {cols} FROM {lsub} WHERE NOT EXISTS "
            f"(SELECT 1 FROM {rsub} WHERE r.{rk} = l.{lk})"
        )

    con = duck_connection(SF_DIR)
    try:
        # no unique key in the projection: align by full-row multiset
        assert_equivalent(out, con, sql, [], f"join seed={seed} {lt} {how}")
    finally:
        con.close()


# --------------------------------------------------------------------------
# set-operation axis: union all / intersect / except over two filtered
# projections of one table
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(6))
def test_random_set_ops_match_duckdb(spark, seed):
    rng = random.Random(6000 + seed)
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    proj = [*meta["key"], meta["group"][0]]
    p1, c1 = rng.choice(meta["preds"])
    p2, c2 = rng.choice(meta["preds"])
    op = rng.choice(["union_all", "intersect", "except"])

    a = _load(spark, table).where(c1()).select(*proj)
    b = _load(spark, table).where(c2()).select(*proj)
    if op == "union_all":
        out = a.unionAll(b)
        kw = "UNION ALL"
    elif op == "intersect":
        out = a.intersect(b)  # set semantics: distinct, like SQL INTERSECT
        kw = "INTERSECT"
    else:
        # SQL EXCEPT = distinct rows of A not present in B at all — that is
        # subtract(), NOT exceptAll().distinct() (a row with 3 copies in A
        # and 1 in B survives the latter but must not appear: the fixture's
        # duplicate rows caught exactly this divergence)
        out = a.subtract(b)
        kw = "EXCEPT"

    cols = ", ".join(proj)
    sql = (
        f"SELECT {cols} FROM {table} WHERE {p1} {kw} "
        f"SELECT {cols} FROM {table} WHERE {p2}"
    )
    con = duck_connection(SF_DIR)
    try:
        assert_equivalent(out, con, sql, [], f"setop seed={seed} {table} {op}")
    finally:
        con.close()


# --------------------------------------------------------------------------
# scalar-expression axis (SQLancer-style engine parity): random expression
# trees from a portable pool, built with F.expr on the DataFrame side and
# the identical text on DuckDB's side
# --------------------------------------------------------------------------

SCALAR_EXPRS = [
    "abs(o_totalprice - 150000.0)",
    "least(o_orderkey % 97, 50)",
    "greatest(length(o_orderpriority), 8)",
    "length(o_orderstatus || o_orderpriority)",
    "upper(substr(o_orderpriority, 1, 3))",
    "coalesce(nullif(o_orderstatus, 'O'), 'opened')",
    "case when o_totalprice > 200000 then 'hi' when o_totalprice > 100000 "
    "then 'mid' else 'lo' end",
    "round(o_totalprice / 7.0, 2)",
    "extract(year from o_orderdate)",
    "lower(o_orderstatus) || '-' || cast(o_orderkey % 10 as string)",
]


@pytest.mark.parametrize("seed", range(6))
def test_random_scalar_exprs_match_duckdb(spark, seed):
    rng = random.Random(7000 + seed)
    picked = rng.sample(SCALAR_EXPRS, 3)
    pred = rng.choice([None, *TABLES["orders"]["preds"]])

    df = _load(spark, "orders")
    if pred:
        df = df.where(pred[1]())
    out = df.select(
        "o_orderkey",
        *[F.expr(e).alias(f"e{i}") for i, e in enumerate(picked)],
    )

    # DuckDB spells string casts VARCHAR; everything else is shared text
    sel = ", ".join(
        f"{e.replace('as string', 'as varchar')} AS e{i}"
        for i, e in enumerate(picked)
    )
    sql = f"SELECT o_orderkey, {sel} FROM orders"
    if pred:
        sql += f" WHERE {pred[0]}"
    con = duck_connection(SF_DIR)
    try:
        assert_equivalent(
            out, con, sql, ["o_orderkey"], f"scalar seed={seed}"
        )
    finally:
        con.close()


# --------------------------------------------------------------------------
# SQL-frontend axis: the SAME generated SQL text through spark.sql() and
# DuckDB — parser/analyzer parity on top of the DataFrame-API axes above
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(6))
def test_random_sql_text_matches_duckdb(spark, seed):
    """Re-render an aggregate spec as ONE SQL string and run that exact
    text on both engines (tables exposed as temp views).  The DataFrame
    axes pin the API translation; this pins the SQL frontend itself."""
    rng = random.Random(8000 + seed)
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    keys = rng.sample(meta["group"], rng.randint(1, min(2, len(meta["group"]))))
    pool = _agg_pool(meta, rng)
    picked, seen = [], set()
    for a in rng.sample(pool, 3):
        if a[0] not in seen:
            seen.add(a[0])
            picked.append(a)
    psql, _ = rng.choice(meta["preds"])

    sel = ", ".join([*[str(k) for k in keys], *[frag for _, _, frag in picked]])
    sql = (
        f"SELECT {sel} FROM {table} WHERE {psql} "
        f"GROUP BY {', '.join(str(k) for k in keys)}"
    )

    _load(spark, table).createOrReplaceTempView(table)
    out = spark.sql(sql)
    con = duck_connection(SF_DIR)
    try:
        assert_equivalent(
            out, con, sql, [str(k) for k in keys], f"sqltext seed={seed} {table}"
        )
    finally:
        con.close()


# --------------------------------------------------------------------------
# scale smoke: the same spec machinery at sf0.01 (10x rows) — translation
# rules that only hold at one scale (e.g. an alignment that survives
# because no duplicate rows happened to exist) get caught here
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(3))
def test_random_specs_hold_at_sf001(spark, seed):
    from tests.conftest import SF_DIR_MID

    rng = random.Random(9000 + seed)
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    keys = rng.sample(meta["group"], 1)
    pool = _agg_pool(meta, rng)
    picked = pool[: 3]
    psql, pcol = rng.choice(meta["preds"])

    df = spark.read.parquet(f"{SF_DIR_MID}/{table}.parquet").where(pcol())
    out = df.groupBy(*keys).agg(*[c for _, c, _ in picked])
    sel = ", ".join([*keys, *[frag for _, _, frag in picked]])
    sql = (
        f"SELECT {sel} FROM {table} WHERE {psql} "
        f"GROUP BY {', '.join(keys)}"
    )
    con = duck_connection(SF_DIR_MID)
    try:
        assert_equivalent(out, con, sql, keys, f"sf001 seed={seed} {table}")
    finally:
        con.close()


# ---------------------------------------------------------------------------
# text-hygiene axis (r5): repetition signals + paragraph dedup vs a pure
# Python reference on adversarial random documents
# ---------------------------------------------------------------------------

_HYGIENE_VOCAB = [
    "alpha", "beta", "gamma", "delta", "the", "42", "#", "x...", "…",
    "-", "*", "•", "buy", "now", "tab\tsep",
]


def _random_hygiene_doc(rng: random.Random) -> str:
    """Random doc mixing words, symbols, bullets, ellipses, newline runs,
    tabs, and injected repetition — the shapes that broke naive
    tokenization during development."""
    roll = rng.random()
    if roll < 0.04:
        return ""
    if roll < 0.08:
        return rng.choice([" ", "\n", "\n\n", " \n ", "\t"])
    parts = []
    for _ in range(rng.randint(1, 50)):
        parts.append(rng.choice(_HYGIENE_VOCAB))
        r = rng.random()
        if r < 0.10:
            parts.append("\n")
        elif r < 0.16:
            parts.append("\n\n")
        elif r < 0.18:
            parts.append("\n\n\n")
    if rng.random() < 0.5 and parts:
        seg = parts[: rng.randint(1, min(14, len(parts)))]
        parts = parts + ["\n"] + seg * rng.randint(1, 3)
    return " ".join(parts)


def _ref_repetition_signals(t: str) -> dict:
    """Independent reference for operators/text.py::repetition_signals —
    same published definitions, separately coded."""
    import re as _re
    from collections import Counter

    lines = [ln.strip() for ln in t.split("\n") if ln.strip()]
    paras = [p.strip() for p in _re.split(r"\n{2,}", t) if p.strip()]
    toks = t.split()
    tc = len(" ".join(toks))

    def dup(parts):
        if not parts:
            return 0, 0.0, 0.0
        c = Counter(parts)
        occ = sum(v for v in c.values() if v > 1)
        tot = sum(len(p) for p in parts)
        dch = sum(len(p) * v for p, v in c.items() if v > 1)
        return len(parts), occ / len(parts), (dch / tot if tot else 0.0)

    def top(n):
        if len(toks) < n or tc == 0:
            return 0.0
        g = Counter(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
        k, v = max(g.items(), key=lambda kv: (kv[1], len(kv[0]), kv[0]))
        return v * len(k) / tc

    def cov(n):
        tot = sum(len(w) for w in toks)
        if len(toks) < n or tot == 0:
            return 0.0
        g = Counter(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))
        mark = [False] * len(toks)
        for i in range(len(toks) - n + 1):
            if g[tuple(toks[i:i + n])] > 1:
                mark[i:i + n] = [True] * n
        return sum(len(w) for w, m in zip(toks, mark) if m) / tot

    n_lines, dlf, dlcf = dup(lines)
    n_paras, dpf, dpcf = dup(paras)
    n_w = len(toks)
    hashes = t.count("#")
    ell = len(_re.findall(r"\.\.\.|…", t))
    bullets = sum(1 for ln in lines if _re.match(r"(-|\*|•)", ln))
    ell_end = sum(1 for ln in lines if _re.search(r"(\.\.\.|…)$", ln))
    alpha = sum(1 for w in toks if _re.search("[A-Za-z]", w))
    return {
        "n_lines": n_lines, "dup_line_frac": dlf, "dup_line_char_frac": dlcf,
        "n_paras": n_paras, "dup_para_frac": dpf, "dup_para_char_frac": dpcf,
        "top_2gram_char_frac": top(2), "top_3gram_char_frac": top(3),
        "top_4gram_char_frac": top(4),
        "dup_5gram_char_frac": cov(5), "dup_10gram_char_frac": cov(10),
        "symbol_word_ratio": (hashes + ell) / n_w if n_w else 0.0,
        "bullet_line_frac": bullets / n_lines if n_lines else 0.0,
        "ellipsis_line_frac": ell_end / n_lines if n_lines else 0.0,
        "alpha_word_frac": alpha / n_w if n_w else 0.0,
    }


@pytest.mark.parametrize("seed", range(4))
def test_random_repetition_signals_match_reference(spark, seed):
    from vector_search_databricks_poc_spark.operators.text import (
        repetition_signals,
    )

    rng = random.Random(11000 + seed)
    docs = [(i, _random_hygiene_doc(rng)) for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}
    for doc_id, text in docs:
        want = _ref_repetition_signals(text)
        have = got[doc_id]
        for k, v in want.items():
            # shape ratios are rounded to 6 decimals Spark-side
            tol = 5e-6 if k.endswith(("_ratio", "_line_frac", "alpha_word_frac")) else 1e-9
            assert abs(have[k] - v) <= tol, (seed, doc_id, k, have[k], v, text[:80])


@pytest.mark.parametrize("seed", range(4))
def test_random_paragraph_dedup_matches_reference(spark, seed):
    """Per-document equality of rebuilt text + kept/dropped counts against
    a first-occurrence keeper, on corpora with cross-document shared
    paragraphs."""
    import re as _re

    from vector_search_databricks_poc_spark.operators.text import (
        paragraph_dedup,
    )

    rng = random.Random(12000 + seed)
    shared_pool = [f"shared paragraph number {i}" for i in range(6)]
    docs = []
    for i in range(30):
        body = _random_hygiene_doc(rng)
        blocks = [body] if body else []
        for s in rng.sample(shared_pool, rng.randint(0, 3)):
            if rng.random() < 0.5:
                blocks.insert(0, s)
            else:
                blocks.append(s)
        docs.append((i, "\n\n".join(blocks)))

    seen: set[str] = set()
    want: dict[int, tuple[str, int, int]] = {}
    for doc_id, t in docs:
        out, kept, dropped = [], 0, 0
        for p in _re.split(r"\n{2,}", t):
            p = p.strip()
            if not p:
                continue
            if p in seen:
                dropped += 1
            else:
                seen.add(p)
                out.append(p)
                kept += 1
        want[doc_id] = ("\n\n".join(out), kept, dropped)

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_paras_kept"], r["n_paras_dropped"])
        for r in paragraph_dedup(df).collect()
    }
    assert got == want, (seed,)
