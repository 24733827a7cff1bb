"""File sources/sinks beyond parquet (engine source surface).

The reference's only sources are literal rows and an HTTP fetch
(syntetic_data.py:55-65, syntetic_data_arxiv.py:75-129), with Delta as the
sink.  A standalone engine needs the standard landing formats; the rule at
scale is always **explicit schema** — schema inference reads the data twice
and can silently widen types between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Newline-delimited JSON with declared schema (no inference pass)."""
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSONL read with malformed-line quarantine.

    Returns ``(good, bad)`` built from ONE source scan: the reader parses
    with the declared schema plus a ``_corrupt_record`` column; rows that
    fail to parse surface there (other columns null) instead of killing the
    job — the 100 TB contract, where a handful of truncated lines in a
    million landing files must not abort ingestion.  ``good`` drops the
    marker column; ``bad`` carries the raw line for a quarantine sink.

    Note Spark's documented caveat: a query whose pruned column set is
    ONLY the corrupt column is disallowed
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parser would short-circuit),
    and ``bad.count()`` prunes to exactly that.  Spark's documented fix is
    caching; here a LAZY ``localCheckpoint`` serves both purposes without
    catalog-level cache residency (a ``.cache()`` would pin the parsed
    corpus in the catalog until someone explicitly unpersists): the
    checkpoint hides the JSON scan behind a LogicalRDD (so the
    corrupt-column-only restriction can't trigger), makes both legs read
    one materialized parse, and its blocks are released by the
    ContextCleaner once the returned frames are garbage-collected.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    marker = "_corrupt_record"
    full = StructType(
        list(schema.fields) + [StructField(marker, StringType(), True)]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", marker)
        .json(path)
    ).localCheckpoint(eager=False)
    good = raw.where(F.col(marker).isNull()).drop(marker)
    bad = raw.where(F.col(marker).isNotNull()).withColumnRenamed(
        marker, "raw_line"
    )
    return good, bad


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read across parquet generations: ``mergeSchema``
    unions the file schemas (reference's escape hatch is the write-side
    ``overwriteSchema``, syntetic_data_arxiv.py:131 — read-side merge is
    the standalone equivalent).  Columns absent in older files read as
    null; incompatible type changes fail loudly at planning time."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Format-agnostic partitioned sink.  ``fmt='delta'`` works when
    delta-spark is on the classpath (the reference's native sink,
    syntetic_data.py:66); parquet otherwise — same layout, no CDF.
    """
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
