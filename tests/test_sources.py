"""File source/sink round-trips (sources.files) and catalog DDL."""

from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.catalog import ensure_database, load_table
from vector_search_databricks_poc_spark.sources.files import (
    read_csv,
    read_jsonl,
    write_partitioned,
)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_json")
    docs.write.json(path)
    back = read_jsonl(spark, path, docs.schema)
    assert back.count() == docs.count()
    assert back.schema == docs.schema
    assert back.exceptAll(docs).count() == 0


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_csv")
    orders.write.option("header", "true").csv(path)
    back = read_csv(spark, path, orders.schema)
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0


def test_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "by_lang")
    write_partitioned(docs, path, partition_by=["lang"])
    import os

    assert any(p.startswith("lang=") for p in os.listdir(path))
    # partition filter prunes: only one lang directory is scanned
    from vector_search_databricks_poc_spark.plans.audit import plan_string

    scan = spark.read.parquet(path).where(F.col("lang") == "en")
    assert scan.count() == docs.where(F.col("lang") == "en").count()
    assert "PartitionFilters: [isnotnull(lang" in plan_string(scan) or "lang#" in plan_string(scan)


def test_ensure_database(spark):
    ensure_database(spark, "engine_test_db")
    assert spark.catalog.databaseExists("engine_test_db")
    spark.sql("DROP DATABASE IF EXISTS engine_test_db")
