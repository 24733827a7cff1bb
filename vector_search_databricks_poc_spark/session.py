"""SparkSession factory.

Centralizes the configs that matter at 100 TB scale: AQE (runtime re-plan,
skew-join handling), Arrow (vectorized Python boundary — the reference's one
performance idea, syntetic_data.py:135), shuffle-partition sizing, and
broadcast threshold.  Tests and the bench harness both go through here so
every plan is produced under the same optimizer settings.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vector-search-poc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback ``local[*]``)
    so the same entry points work under the driver harness and in CI.  On a
    real cluster, callers pass ``master=None`` with a pre-configured
    environment and these configs still apply.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas_udf / mapInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Broadcast small dims (region/nation/queries side of similarity join).
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # zstd beats snappy ~30% at rest for index/embedding tables; at
        # 100 TB the scan is IO-bound, so smaller files = faster probes.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Fixture events.ts is parquet TIMESTAMP(NANOS); Spark has no ns
        # timestamp — read as long, catalog.load_table converts to µs.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
