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
