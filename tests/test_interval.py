"""Bucketed range join correctness vs naive range join; skew diagnosis."""

from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.interval import (
    bucketed_range_join,
    diagnose_skew,
)


def test_bucketed_range_join_equals_naive(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    iv = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("user_id"),
            (F.lit("2024-01-01").cast("timestamp_ntz")
             + F.make_interval(hours=(F.col("o_orderkey") % 48).cast("int"))).alias("s"),
            (F.lit("2024-01-01").cast("timestamp_ntz")
             + F.make_interval(hours=(F.col("o_orderkey") % 48 + 5).cast("int"))).alias("e"),
        )
    )
    fast = bucketed_range_join(ev, iv, "ts", "s", "e", bucket="3 hours", extra_equi="user_id")
    naive = ev.join(
        iv,
        on=[
            ev["user_id"] == iv["user_id"],
            ev["ts"].cast("timestamp_ntz") >= iv["s"],
            ev["ts"].cast("timestamp_ntz") < iv["e"],
        ],
    )
    assert fast.count() == naive.count()
    a = {(r["event_id"], r["o_orderkey"]) for r in fast.select("event_id", "o_orderkey").collect()}
    b = {(r["event_id"], r["o_orderkey"]) for r in naive.select("event_id", "o_orderkey").collect()}
    assert a == b


def test_bucketed_range_join_is_equi_join(spark, sf_dir):
    """The whole point: no BroadcastNestedLoopJoin in the plan."""
    from vector_search_databricks_poc_spark.plans.audit import plan_string

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    iv = load_table(spark, sf_dir, "orders").limit(50).select(
        "o_orderkey",
        F.lit("2024-01-01").cast("timestamp_ntz").alias("s"),
        F.lit("2024-01-02").cast("timestamp_ntz").alias("e"),
    )
    fast = bucketed_range_join(ev, iv, "ts", "s", "e", bucket="1 day")
    assert "BroadcastNestedLoopJoin" not in plan_string(fast, "simple")


def test_diagnose_skew(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    top = diagnose_skew(ev, "user_id", top=5).collect()
    assert len(top) == 5
    assert all(0 < r["share"] <= 1.0 for r in top)
    shares = [r["n_rows"] for r in top]
    assert shares == sorted(shares, reverse=True)


def test_funnel_planted_sequences(spark):
    """Ordering semantics: a user converts a step only if it happens AFTER
    their previous step's earliest time; out-of-order and missing steps
    stop the funnel at the right depth."""
    from vector_search_databricks_poc_spark.operators.funnel import (
        funnel_conversions,
        funnel_user_times,
    )

    rows = [
        # u1: full ordered conversion
        (1, "view", 10.0), (1, "click", 20.0), (1, "purchase", 30.0),
        # u2: purchase BEFORE view -> stops after view
        (2, "purchase", 5.0), (2, "view", 6.0),
        # u3: click only, never entered the funnel
        (3, "click", 1.0),
        # u4: click before view, second click after -> converts step 2
        (4, "click", 1.0), (4, "view", 2.0), (4, "click", 3.0),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    t = {r["user_id"]: r for r in funnel_user_times(
        ev, ["view", "click", "purchase"]).collect()}
    assert t[1]["t1"] == 10.0 and t[1]["t2"] == 20.0 and t[1]["t3"] == 30.0
    assert t[2]["t1"] == 6.0 and t[2]["t2"] is None and t[2]["t3"] is None
    assert 3 not in t
    assert t[4]["t1"] == 2.0 and t[4]["t2"] == 3.0 and t[4]["t3"] is None
    summary = {r["step"]: r for r in funnel_conversions(
        ev, ["view", "click", "purchase"]).collect()}
    assert summary[1]["n_users"] == 3 and summary[1]["conversion"] == 1.0
    assert summary[2]["n_users"] == 2
    assert summary[3]["n_users"] == 1
    assert summary[3]["conversion"] == round(1 / 3, 6)


def test_funnel_matches_duckdb(spark):
    """Value-compare the full funnel summary against a DuckDB CTE chain on
    the fixture events."""
    from tests.conftest import SF_DIR
    from tests.oracle_utils import compare, duck_connection
    from vector_search_databricks_poc_spark import queries_registry as R

    # registry-level: the declared rows-only query, not just the operator
    out = R.QUERIES["funnel_conversions"](spark, SF_DIR)
    sql = """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), n AS (
      SELECT (SELECT COUNT(*) FROM s1) AS n1,
             (SELECT COUNT(*) FROM s2) AS n2,
             (SELECT COUNT(*) FROM s3) AS n3
    )
    SELECT 1 AS step, 'view' AS event_type, n1 AS n_users,
           ROUND(n1 / CAST(n1 AS DOUBLE), 6) AS conversion FROM n
    UNION ALL
    SELECT 2, 'click', n2, ROUND(n2 / CAST(n1 AS DOUBLE), 6) FROM n
    UNION ALL
    SELECT 3, 'purchase', n3, ROUND(n3 / CAST(n1 AS DOUBLE), 6) FROM n
    """
    r = compare(out, duck_connection(SF_DIR), sql)
    assert r["values_match"], r


def test_cohort_retention_matches_duckdb(spark):
    """Value-compare the retention matrix against DuckDB using the same
    epoch-day period arithmetic."""
    from tests.conftest import SF_DIR
    from tests.oracle_utils import compare, duck_connection
    from vector_search_databricks_poc_spark import queries_registry as R

    # registry-level: the declared rows-only query, not just the operator
    out = R.QUERIES["cohort_retention"](spark, SF_DIR)
    sql = """
    WITH ap AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS p
      FROM events
    ), first AS (
      SELECT user_id, MIN(p) AS cohort FROM ap GROUP BY user_id
    ), sizes AS (
      SELECT cohort, COUNT(*) AS cohort_size FROM first GROUP BY cohort
    ), ret AS (
      SELECT f.cohort, ap.p - f.cohort AS period_offset,
             COUNT(DISTINCT ap.user_id) AS n_active
      FROM ap JOIN first f USING (user_id)
      GROUP BY f.cohort, ap.p - f.cohort
    )
    SELECT CAST(DATE '1970-01-01' + INTERVAL (ret.cohort * 7) DAY AS DATE) AS cohort_day,
           ret.period_offset, ret.n_active, s.cohort_size,
           ROUND(ret.n_active / CAST(s.cohort_size AS DOUBLE), 6) AS retention
    FROM ret JOIN sizes s ON ret.cohort = s.cohort
    ORDER BY cohort_day, period_offset
    """
    r = compare(out, duck_connection(SF_DIR), sql)
    assert r["values_match"], r


def test_cohort_retention_planted(spark):
    """Planted cohorts: offset-0 retention is always 1.0; a user active in
    a later period counts toward exactly their first-activity cohort."""
    from vector_search_databricks_poc_spark.operators.funnel import cohort_retention

    rows = [
        (1, "2024-01-01 10:00:00"),  # cohort A
        (1, "2024-01-09 10:00:00"),  # active next period
        (2, "2024-01-02 10:00:00"),  # cohort A, never returns
        (3, "2024-01-10 10:00:00"),  # cohort B only
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts_s"]).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = {
        (str(r.cohort_day), r.period_offset): (r.n_active, r.cohort_size, r.retention)
        for r in cohort_retention(ev, period_days=7).collect()
    }
    offsets0 = [v for (d, k), v in out.items() if k == 0]
    assert all(v[2] == 1.0 for v in offsets0)
    # cohort A has 2 users, one returns at offset 1 -> retention 0.5
    a_day = [d for (d, k) in out if k == 1]
    assert len(a_day) == 1
    assert out[(a_day[0], 1)][0] == 1 and out[(a_day[0], 1)][2] == 0.5


def test_validate_contract_matches_duckdb(spark):
    """Value-compare the whole contract report against plain DuckDB SQL on
    the fixture orders/customer tables."""
    from tests.conftest import SF_DIR
    from tests.oracle_utils import compare, duck_connection
    from vector_search_databricks_poc_spark import queries_registry as R

    out = R.QUERIES["validate_contract"](spark, SF_DIR)
    sql = """
    WITH t AS (SELECT COUNT(*) AS total FROM orders)
    SELECT 'in_range(o_totalprice,0,10000000.0)' AS rule,
           (SELECT COUNT(*) FROM orders
            WHERE o_totalprice IS NOT NULL
              AND o_totalprice NOT BETWEEN 0 AND 1e7) AS violations,
           total, TRUE AS ok FROM t
    UNION ALL
    SELECT 'not_null(o_custkey)',
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL), total, TRUE FROM t
    UNION ALL
    SELECT 'not_null(o_orderkey)',
           (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL), total, TRUE FROM t
    UNION ALL
    SELECT 'one_of(o_orderstatus)',
           (SELECT COUNT(*) FROM orders
            WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O','P')),
           total, TRUE FROM t
    UNION ALL
    SELECT 'ref(o_custkey->c_custkey)',
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
           total, TRUE FROM t
    UNION ALL
    SELECT 'unique(o_orderkey)',
           (SELECT COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) FROM orders),
           total, TRUE FROM t
    ORDER BY rule
    """
    r = compare(out, duck_connection(SF_DIR), sql)
    assert r["values_match"], r


def test_validate_contract_planted_violations(spark):
    """Planted bad rows: every rule kind reports the exact violation count
    and flips ok=false."""
    from vector_search_databricks_poc_spark.operators.quality import (
        in_range,
        matches,
        not_null,
        one_of,
        validate_table,
    )

    rows = [
        (1, "a@x.com", 10.0, "F"),
        (2, None, 20.0, "O"),        # null email
        (2, "b@x.com", -5.0, "F"),   # dup id + out-of-range
        (4, "not-an-email", 30.0, "Z"),  # regex + enum violation
    ]
    df = spark.createDataFrame(rows, ["id", "email", "amount", "status"])
    dim = spark.createDataFrame([(1,), (2,)], ["id"])  # 4 is dangling
    rep = {
        r.rule: (r.violations, r.ok)
        for r in validate_table(
            df,
            row_rules=[
                not_null("email"),
                in_range("amount", 0, 100),
                matches("email", "^[^@]+@[^@]+$"),
                one_of("status", ["F", "O"]),
            ],
            unique_cols=["id"],
            references=[("id", dim, "id")],
        ).collect()
    }
    assert rep["not_null(email)"] == (1, False)
    assert rep["in_range(amount,0,100)"] == (1, False)
    assert rep["matches(email)"] == (1, False)
    assert rep["one_of(status)"] == (1, False)
    assert rep["unique(id)"] == (1, False)
    assert rep["ref(id->id)"] == (1, False)


def test_join_size_preflight_matches_duckdb_and_reality(spark):
    """The pre-flight estimate is EXACT: equals both the DuckDB arithmetic
    and the actually-executed join's row count."""
    from tests.conftest import SF_DIR
    from tests.oracle_utils import compare, duck_connection
    from vector_search_databricks_poc_spark import queries_registry as R

    # registry-level: the declared rows-only query, not just the operator
    li = load_table(spark, SF_DIR, "lineitem")
    out = R.QUERIES["join_size_preflight"](spark, SF_DIR)
    sql = """
    WITH c AS (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey)
    SELECT SUM(n * n) AS join_rows,
           COUNT(*) AS matching_keys,
           MAX(n * n) AS max_key_pairs,
           MAX_BY(l_orderkey, n * n * 10000000000 + l_orderkey) AS top_key
    FROM c
    """
    r = compare(out, duck_connection(SF_DIR), sql)
    assert r["values_match"], r
    real = li.alias("a").join(li.alias("b"), "l_orderkey").count()
    assert out.first()["join_rows"] == real
