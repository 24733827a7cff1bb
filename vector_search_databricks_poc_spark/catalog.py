"""Table/catalog conventions.

The reference keeps a 3-level Unity Catalog namespace with a ``full_name``
helper (syntetic_data.py:32-35) and saves every stage as a managed table
(syntetic_data.py:66,180).  Vanilla Spark gives us a 2-level namespace; the
fixture corpus is plain parquet, so the catalog layer here is a thin loader
that (a) reads each table lazily, (b) registers temp views so the SQL front
end works, and (c) never materializes anything on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Fixture corpus (TESTDATA.md): TPC-H-ish star schema + events + the two
# reference-derived domain tables (documents, embeddings).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def full_name(database: str, table: str) -> str:
    """2-level namespace helper (reference's 3-level ``full_name``,
    syntetic_data.py:35, collapsed to vanilla-Spark catalog depth)."""
    return f"{database}.{table}"


def ensure_database(spark: SparkSession, database: str) -> None:
    """Idempotent namespace DDL (reference syntetic_data.py:32-34)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")


# ---------------------------------------------------------------------------
# 3-level namespace emulation (reference syntetic_data.py:32-35:
# ``CREATE CATALOG IF NOT EXISTS``, ``catalog.schema.table``).  Vanilla
# Spark's session catalog is 2-level, so the catalog level is encoded into
# the database name (``catalog__schema``) — deterministic, reversible, and
# honest about the mechanism.  Swapping in a real 3-level catalog later
# (Unity, a V2 catalog plugin) means deleting the encoding, not rewriting
# callers: the API below is already (catalog, schema, table)-shaped.
# ---------------------------------------------------------------------------

_NS_SEP = "__"


def encode_namespace(catalog: str, schema: str) -> str:
    """Map (catalog, schema) onto one vanilla-Spark database name.
    Rejects names that would make the mapping ambiguous: ``__`` or ``.``
    inside a part, and boundary underscores — ``cat_`` + ``x`` and
    ``cat`` + ``_x`` would otherwise both encode to ``cat___x``."""
    for part in (catalog, schema):
        if (
            not part
            or _NS_SEP in part
            or "." in part
            or part.startswith("_")
            or part.endswith("_")
        ):
            raise ValueError(f"invalid namespace part: {part!r}")
    return f"{catalog}{_NS_SEP}{schema}"


def full_name3(catalog: str, schema: str, table: str) -> str:
    """3-level ``full_name`` (reference syntetic_data.py:35) over the
    encoded 2-level catalog."""
    return f"{encode_namespace(catalog, schema)}.{table}"


def parse_full_name(name: str) -> tuple[str | None, str | None, str]:
    """Split ``[catalog.]schema.]table`` (or its encoded 2-level form)
    back into (catalog, schema, table); missing levels come back None."""
    parts = name.split(".")
    if len(parts) == 3:
        return parts[0], parts[1], parts[2]
    if len(parts) == 2:
        db, table = parts
        if _NS_SEP in db:
            cat, schema = db.split(_NS_SEP, 1)
            return cat, schema, table
        return None, db, table
    if len(parts) == 1:
        return None, None, parts[0]
    raise ValueError(f"invalid table name: {name!r}")


def ensure_namespace(spark: SparkSession, catalog: str, schema: str) -> None:
    """Idempotent ``CREATE CATALOG/SCHEMA IF NOT EXISTS`` twin
    (syntetic_data.py:32-34): one encoded database per (catalog, schema)."""
    ensure_database(spark, encode_namespace(catalog, schema))


def list_schemas(spark: SparkSession, catalog: str) -> list[str]:
    """Schemas under an emulated catalog — the SHOW SCHEMAS IN <catalog>
    analog; one metastore listing, no data touched."""
    prefix = catalog + _NS_SEP
    return sorted(
        db.name[len(prefix):]
        for db in spark.catalog.listDatabases()
        if db.name.startswith(prefix)
    )


def _ensure_conf(spark: SparkSession) -> None:
    """Runtime-settable configs the engine depends on, applied defensively
    so externally created sessions (the driver harness) behave like ours."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_event_ts(df)
    return _normalize_ntz(df)


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-zoned TIMESTAMP.

    Fixture generations vary: parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
    reads as TIMESTAMP_NTZ, earlier corpora read as TIMESTAMP_LTZ.  The
    session zone is pinned to UTC (_ensure_conf), so the cast reinterprets the
    naive value without changing the wall-clock reading — downstream operators
    and the DuckDB oracle (naive µs TIMESTAMP) see identical values either way.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts``: the original fixture encoded it as parquet
    TIMESTAMP(NANOS), which reads as long ns under
    spark.sql.legacy.parquet.nanosAsLong — truncate to µs (same floor
    division DuckDB applies casting TIMESTAMP_NS -> TIMESTAMP).  Micros
    fixtures fall through to _normalize_ntz."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(df.schema["ts"].dataType, T.LongType):
        # FLOOR division, not `ts div 1000`: div truncates toward zero,
        # which diverges from DuckDB's TIMESTAMP_NS -> TIMESTAMP floor by
        # 1 us on pre-epoch (negative) nanos.  pmod makes the numerator
        # exactly divisible, keeping the arithmetic integer-exact (a
        # double division would lose precision at 2e18 ns).
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000"))
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Expose fixture tables to ``spark.sql`` as temp views."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the plan is under-parallel for CPU-heavy work.

    Small fixture files arrive as 1-2 scan partitions (one 128 MB split per
    file), which serializes hashing/embedding across an entire multi-core
    executor.  At 100 TB inputs already have thousands of splits and this is
    a no-op — the check costs one metadata call, not a job.
    """
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df


def write_text_file(spark: SparkSession, path: str, content: str) -> None:
    """Write one small text file driver-side through the Hadoop FS API.

    Metadata markers (index ``_meta``, matview applied-batch) are tens of
    bytes; routing them through ``df.write.text`` launches a full Spark
    write job — measured 5-8 s PER MARKER on Spark 4.1 local (job +
    committer overhead), vs ~50 ms for a direct ``FileSystem.create``
    (guide §5: the driver should do no data work, and a 30-byte marker is
    not data work for the cluster either).  Same portability: the path's
    own FileSystem is resolved from the session's Hadoop conf, so this
    works on any storage the cluster can reach."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text_file(spark: SparkSession, path: str) -> str:
    """Driver-side read of one small text file (twin of
    :func:`write_text_file`); also accepts a legacy ``df.write.text``
    DIRECTORY (reads its part files) so pre-existing markers load."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)

    def _read_one(fpath) -> bytes:
        # NOTE: stream.read(buffer) is useless over py4j (the Java side
        # fills a COPY of the buffer); copy server-side into a byte[]
        # and let py4j return it by value
        ins = fs.open(fpath)
        try:
            bos = jvm.java.io.ByteArrayOutputStream()
            jvm.org.apache.hadoop.io.IOUtils.copyBytes(ins, bos, 65536, False)
            return bytes(bos.toByteArray())
        finally:
            ins.close()

    if fs.getFileStatus(p).isDirectory():
        parts = [
            st.getPath()
            for st in fs.listStatus(p)
            if st.getPath().getName().startswith("part-")
        ]
        data = b"".join(_read_one(fp) for fp in sorted(parts, key=lambda x: x.getName()))
    else:
        data = _read_one(p)
    return data.decode("utf-8")


def save_table(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Parquet sink (reference's delta ``saveAsTable``, syntetic_data.py:66).

    Partitioned writes are the scale path: index artifacts are partitioned by
    bucket id so the search job prunes partitions instead of scanning.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def validate_primary_key(df: DataFrame, id_col: str) -> dict:
    """PK-convention check (SURVEY.md §1.1: the reference's index requires
    `primary_key="id"`, syntetic_data.py:103; vanilla Spark has no
    constraint enforcement, so validation is an explicit op).

    ONE aggregate pass returns {'rows', 'distinct', 'nulls', 'valid'}:
    valid = every row has a non-null id and no id repeats.  At 100 TB this
    is a single shuffle-free partial+final count job.
    """
    from pyspark.sql import functions as F

    row = df.agg(
        F.count("*").alias("rows"),
        F.count_distinct(F.col(id_col)).alias("distinct"),
        F.sum(F.col(id_col).isNull().cast("long")).alias("nulls"),
    ).first()
    out = {"rows": row["rows"], "distinct": row["distinct"], "nulls": row["nulls"] or 0}
    out["valid"] = out["nulls"] == 0 and out["distinct"] == out["rows"]
    return out


def assert_primary_key(df: DataFrame, id_col: str) -> None:
    """Raise ValueError with the violation counts when the PK convention
    does not hold — the guard index builds call before trusting an id."""
    v = validate_primary_key(df, id_col)
    if not v["valid"]:
        raise ValueError(
            f"{id_col} is not a valid primary key: {v['rows']} rows, "
            f"{v['distinct']} distinct, {v['nulls']} nulls"
        )
