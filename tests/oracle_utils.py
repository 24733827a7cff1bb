"""Local stand-in for the driver's DuckDB-oracle comparison.

Mirrors __spark_entry__.py's contract: run the Spark query and the oracle SQL
on the same parquet fixtures, compare row count, column names, and an
order-insensitive value multiset (columns sorted by name, values stringified
with float normalization).
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    rel = con.sql(sql)
    duck_rows = rel.fetchall()
    duck_cols = list(rel.columns)

    out = {
        "rows_match": len(spark_rows) == len(duck_rows),
        "cols_match": sorted(spark_cols) == sorted(duck_cols),
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": spark_cols,
        "duck_cols": duck_cols,
        "values_match": False,
    }
    if out["rows_match"] and out["cols_match"]:
        a = _canon(spark_rows, spark_cols)
        b = _canon(duck_rows, duck_cols)
        out["values_match"] = a == b
        if not out["values_match"]:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            out["first_diffs"] = diffs[:3]
    return out
