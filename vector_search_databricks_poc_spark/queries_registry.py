"""Declared-query registry: the correctness surface of the engine.

Every operator from SURVEY.md §2 gets one entry here: a Spark callable
``(spark, sf_dir) -> DataFrame`` in ``QUERIES`` and, when SQL-expressible,
a DuckDB oracle string in ``ORACLE_SQL``.  Conventions (SURVEY.md §5.2/§7.4):

- deterministic only — no current_timestamp, no unseeded sampling;
- every computed column aliased identically on both sides;
- float aggregates made hash-exact: money sums go through DECIMAL(18,2)
  then cast to DOUBLE (exact on both engines); similarity scores computed
  in double and rounded to 6 decimals;
- every top-k / rank breaks ties on a unique id column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import vectors as V
from .catalog import load_table
from .operators import topk as T


def dsum(col: str, scale: int = 2) -> F.Column:
    """Hash-exact money sum: DECIMAL-exact accumulation, one final cast to
    DOUBLE (both engines produce the identical double)."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double")


def _dsum_sql(col: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE)"

QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0):
    """Fixed, deterministic query vector: the stored embedding of ``vec_id``.

    One-row collect — this is the query literal (the reference embeds the
    query text on the driver the same way, query_endpoint.py:83-115), not a
    data materialization.
    """
    row = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == vec_id)
        .select(F.col("embedding").cast("array<double>"))
        .first()
    )
    return row[0]


# ---------------------------------------------------------------------------
# B7 flagship: top-k cosine similarity search + document join
# ---------------------------------------------------------------------------

_COSINE_DUCK = (
    "ROUND(list_dot_product(e.embedding::DOUBLE[], q.qv) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.qv, q.qv))), 6)"
)


@register(
    "topk_cosine_search",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, d.text, {_COSINE_DUCK} AS score
    FROM embeddings e CROSS JOIN q
    JOIN documents d ON d.doc_id = e.vec_id
    ORDER BY score DESC, e.vec_id
    LIMIT 10
    """,
)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11+A13 Spark-native: score = cosine as Catalyst expression, top-k via
    TakeOrderedAndProject, broadcast join back to text."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    qv = _query_vector(spark, sf_dir, 0)
    hits = T.top_k_similar(emb, qv, k=10, id_col="vec_id", vec_col="embedding")
    return T.search_with_text(hits, docs)


# ---------------------------------------------------------------------------
# B1/B3: scan + projection + filter pushdown, column ops
# ---------------------------------------------------------------------------


@register(
    "scan_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def scan_filter_project(spark, sf_dir):
    """B1: filters and projection reach the parquet scan (PushedFilters +
    pruned ReadSchema in .explain)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "column_ops",
    """
    SELECT o_orderkey AS order_id,
           CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec,
           CAST(o_custkey AS INTEGER) AS cust_int,
           upper(o_orderstatus) AS status_uc
    FROM orders
    """,
)
def column_ops(spark, sf_dir):
    """B3: rename / cast / derive / drop."""
    return (
        load_table(spark, sf_dir, "orders")
        .withColumnRenamed("o_orderkey", "order_id")
        .withColumn("price_dec", F.col("o_totalprice").cast("decimal(18,2)"))
        .withColumn("cust_int", F.col("o_custkey").cast("int"))
        .withColumn("status_uc", F.upper("o_orderstatus"))
        .select("order_id", "price_dec", "cust_int", "status_uc")
    )


# ---------------------------------------------------------------------------
# B2: text cleanup suite (A2's field extraction, Spark-side)
# ---------------------------------------------------------------------------


@register(
    "text_cleanup",
    """
    SELECT doc_id,
           trim(lower(text)) AS clean,
           string_split(text, ' ')[1] AS first_token,
           regexp_replace(text, ' +', '_', 'g') AS underscored,
           substr(text, 1, 10) AS prefix10,
           concat(lang, ':', source) AS lang_source,
           replace(text, 'spark', 'SPARK') AS shouted
    FROM documents
    WHERE doc_id < 100
    """,
)
def text_cleanup(spark, sf_dir):
    """B2/A2: split/element_at, regexp_replace, trim, lower, substring,
    concat, replace — the reference's ingest cleanup as Catalyst exprs
    (syntetic_data_arxiv.py:87-105)."""
    return (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.trim(F.lower("text")).alias("clean"),
            F.element_at(F.split("text", " "), 1).alias("first_token"),
            F.regexp_replace("text", " +", "_").alias("underscored"),
            F.substring("text", 1, 10).alias("prefix10"),
            F.concat_ws(":", "lang", "source").alias("lang_source"),
            F.replace("text", F.lit("spark"), F.lit("SPARK")).alias("shouted"),
        )
    )


@register(
    "arxiv_field_extraction",
    """
    SELECT string_split(raw_id, '/abs/')[-1] AS id,
           trim(regexp_replace(title, chr(10), ' ', 'g')) AS title,
           coalesce(category, 'unknown') AS category,
           replace(link, 'abs/', 'pdf/') AS link
    FROM (
      SELECT 'http://arxiv.org/abs/' || doc_id AS raw_id,
             text || chr(10) || lang AS title,
             CASE WHEN doc_id % 5 = 0 THEN NULL ELSE source END AS category,
             'http://arxiv.org/abs/' || doc_id AS link
      FROM documents WHERE doc_id < 50
    )
    """,
)
def arxiv_field_extraction(spark, sf_dir):
    """A2 port: the reference's per-record arXiv transforms
    (syntetic_data_arxiv.py:87-105) run distributed via sources.arxiv."""
    from .sources.arxiv import clean_arxiv_fields

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    raw = docs.select(
        F.concat(F.lit("http://arxiv.org/abs/"), F.col("doc_id").cast("string")).alias("raw_id"),
        F.concat("text", F.lit("\n"), "lang").alias("title"),
        F.lit(None).cast("string").alias("summary"),
        F.lit(None).cast("string").alias("authors_csv"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("source"))
        .alias("category"),
        F.lit(None).cast("string").alias("published"),
        F.concat(F.lit("http://arxiv.org/abs/"), F.col("doc_id").cast("string")).alias("link"),
    )
    return clean_arxiv_fields(raw).select("id", "title", "category", "link")


# ---------------------------------------------------------------------------
# B14: joins — broadcast equi, star, semi, anti, range/theta
# ---------------------------------------------------------------------------


@register(
    "join_star_revenue",
    f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_items,
           {_dsum_sql('l.l_extendedprice')} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY region, nation
    """,
)
def join_star_revenue(spark, sf_dir):
    """B14 multi-way star join: fact-side shuffle only on l_orderkey;
    customer/nation/region broadcast (under the 64 MB threshold)."""
    t = {n: load_table(spark, sf_dir, n) for n in ("lineitem", "orders", "customer", "nation", "region")}
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice").alias("revenue"))
    )


@register(
    "join_semi",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    GROUP BY c.c_mktsegment
    """,
)
def join_semi(spark, sf_dir):
    """B14 left-semi join: customers having a >300k order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "join_anti",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    """B14 left-anti join: customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select("c_custkey", "c_name")


@register(
    "join_range",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_fast_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderpriority
    """,
)
def join_range(spark, sf_dir):
    """B14 equi+range (theta) join: items shipped within 30 days of order.
    The equi key keeps it a hash join; the range predicate is a post-filter."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (l["l_orderkey"] == o["o_orderkey"])
        & (l["l_shipdate"] >= o["o_orderdate"])
        & (l["l_shipdate"] < o["o_orderdate"] + F.expr("INTERVAL 30 DAY"))
    )
    return l.join(o, cond).groupBy("o_orderpriority").agg(F.count("*").alias("n_fast_items"))


@register(
    "join_outer_coalesce",
    """
    SELECT n.n_name AS nation, COUNT(s.s_suppkey) AS n_suppliers,
           COALESCE({}, 0.0) AS total_bal
    FROM nation n
    LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """.format(_dsum_sql("s.s_acctbal")),
)
def join_outer_coalesce(spark, sf_dir):
    """B14 left-outer join with null-aware aggregation."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return (
        n.join(s, s["s_nationkey"] == n["n_nationkey"], "left")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.coalesce(dsum("s_acctbal"), F.lit(0.0)).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# B15: aggregations — hash agg, distinct, rollup/cube/grouping sets
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity')} AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """B15 (TPC-H Q1 shape): partial+final hash aggregation; decimal-exact
    money sums, rounded float means."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast("decimal(18,4)")
            ).cast("double").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "count_distinct",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def count_distinct(spark, sf_dir):
    """B15: exact distinct aggregation (expand + two-phase agg in Spark)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


def approx_distinct(spark, sf_dir):
    """B15: approx_count_distinct (HLL++) — engine-specific sketch, so
    rows-only check; pytest asserts relative error vs exact."""
    return (
        load_table(spark, sf_dir, "orders")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"))
    )


QUERIES["approx_distinct"] = approx_distinct


@register(
    "rollup_agg",
    """
    SELECT r.r_name AS region, n.n_name AS nation, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (region, nation)
    """,
)
def rollup_agg(spark, sf_dir):
    """B15: rollup (region, nation) -> per-nation, per-region, grand total."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .rollup("region", "nation")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "cube_agg",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark, sf_dir):
    """B15: full cube over two dimensions."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "grouping_sets",
    f"""
    SELECT o_orderstatus, o_orderpriority, {_dsum_sql('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets(spark, sf_dir):
    """B15: explicit grouping sets via the Spark 4 DataFrame API."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupingSets([["o_orderstatus"], ["o_orderpriority"]], "o_orderstatus", "o_orderpriority")
        .agg(dsum("o_totalprice").alias("total"))
    )


# ---------------------------------------------------------------------------
# B16/B17: window functions, sorts, top-k
# ---------------------------------------------------------------------------


@register(
    "window_rank_topn_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_rank_topn_per_group(spark, sf_dir):
    """B16: rank window -> top-3 orders per customer (Spark pushes the
    rn<=3 filter into the window sort as a group-limit)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


@register(
    "window_lag_delta",
    """
    SELECT event_id, user_id,
           ROUND(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
    """,
)
def window_lag_delta(spark, sf_dir):
    """B16: lag/lead over event time per user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "window_running_sum",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS window3_total
    FROM (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
    """,
)
def window_running_sum(spark, sf_dir):
    """B16: running + bounded rows-frame sums (decimal-exact)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dec = F.col("value").cast("decimal(18,2)")
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(dec).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double").alias("running_total"),
        F.sum(dec).over(w.rowsBetween(-2, 0)).cast("double").alias("window3_total"),
    )


@register(
    "global_topn",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def global_topn(spark, sf_dir):
    """B17: global top-k -> TakeOrderedAndProject (no full sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# B18: set operations
# ---------------------------------------------------------------------------


@register(
    "set_ops",
    """
    WITH seg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         big AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000)
    SELECT 'both' AS tag, c_custkey FROM (SELECT * FROM seg INTERSECT SELECT * FROM big)
    UNION ALL
    SELECT 'seg_only' AS tag, c_custkey FROM (SELECT * FROM seg EXCEPT SELECT * FROM big)
    UNION ALL
    SELECT 'union_n' AS tag, COUNT(*) AS c_custkey
    FROM (SELECT * FROM seg UNION SELECT * FROM big)
    """,
)
def set_ops(spark, sf_dir):
    """B18: intersect / except / union (+unionByName via tag column)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    seg = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.where(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("c_custkey")).distinct()
    both = seg.intersect(big).select(F.lit("both").alias("tag"), "c_custkey")
    seg_only = seg.exceptAll(big).distinct().select(F.lit("seg_only").alias("tag"), "c_custkey")
    union_n = (
        seg.union(big).distinct().agg(F.count("*").alias("c_custkey"))
        .select(F.lit("union_n").alias("tag"), "c_custkey")
    )
    return both.unionByName(seg_only).unionByName(union_n)


# ---------------------------------------------------------------------------
# B19: scalar function library — dates, math, json, arrays
# ---------------------------------------------------------------------------


@register(
    "scalar_date_math",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER) AS days_to_2002,
           ROUND(abs(o_totalprice - 200000.0), 2) AS dist_from_200k,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
           ROUND(ln(o_totalprice), 6) AS log_price,
           CASE WHEN o_orderpriority LIKE '1-%' THEN 1
                WHEN o_orderpriority LIKE '2-%' THEN 2 ELSE 9 END AS prio_class
    FROM orders WHERE o_orderkey < 1000
    """,
)
def scalar_date_math(spark, sf_dir):
    """B19: date extraction/truncation/diff + math + CASE."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_2002"),
        F.round(F.abs(F.col("o_totalprice") - 200000.0), 2).alias("dist_from_200k"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_k"),
        F.round(F.log(F.col("o_totalprice")), 6).alias("log_price"),
        F.when(F.col("o_orderpriority").like("1-%"), 1)
        .when(F.col("o_orderpriority").like("2-%"), 2)
        .otherwise(9)
        .alias("prio_class"),
    )


@register(
    "json_extract",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str
    FROM events
    WHERE event_id < 2000
    """,
)
def json_extract(spark, sf_dir):
    """B19-json: get_json_object over the events.props JSON column."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.get_json_object("props", "$.k").alias("k_str"),
    )


@register(
    "array_funcs",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(embedding[1]::DOUBLE, 6) AS first_val,
           ROUND(list_max(embedding)::DOUBLE, 6) AS max_val,
           ROUND(list_min(embedding)::DOUBLE, 6) AS min_val,
           ROUND(list_sum(list_transform(embedding[1:8], x -> x::DOUBLE)), 6) AS head_sum,
           list_contains(list_transform(embedding, x -> x > 0.2), true) AS any_big
    FROM embeddings WHERE vec_id < 200
    """,
)
def array_funcs(spark, sf_dir):
    """B19-array: size/element_at/slice/transform/aggregate/exists."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    emb = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(emb, 1), 6).alias("first_val"),
        F.round(F.array_max(emb), 6).alias("max_val"),
        F.round(F.array_min(emb), 6).alias("min_val"),
        F.round(F.aggregate(F.slice(emb, 1, 8), F.lit(0.0), lambda a, x: a + x), 6).alias("head_sum"),
        F.exists(emb, lambda x: x > 0.2).alias("any_big"),
    )
