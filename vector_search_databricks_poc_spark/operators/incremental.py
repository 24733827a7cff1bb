"""Incremental index maintenance (SURVEY.md A6/B21).

The reference gets incrementality from Delta Change Data Feed + a TRIGGERED
delta-sync pipeline (syntetic_data.py:69-78,101): only changed rows re-embed
and re-index.  Without a managed service, the same contract is a
high-watermark batch job:

    new_rows = source WHERE id > last_indexed_id      (append-only corpora)
             | source WHERE ts > last_sync_ts         (timestamped corpora)

New rows are embedded, normalized, centroid-assigned with the EXISTING
centroids (no refit — same contract as delta-sync, which never rebuilds the
ANN structure on sync), and appended via dynamic partition overwrite so only
touched centroid partitions rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import vectors as V
from .index import IvfIndex, assign_centroid


def high_watermark(spark: SparkSession, index_path: str, id_col: str = "vec_id"):
    """Current max indexed id (one aggregate over index metadata columns;
    at scale, store this in a manifest instead of scanning)."""
    try:
        row = spark.read.parquet(index_path).agg(F.max(id_col)).first()
        return row[0]
    except Exception:
        return None


def incremental_refresh(
    spark: SparkSession,
    index: IvfIndex,
    source: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Append rows with id beyond the watermark into the index table.

    Returns the number of newly indexed rows.  Uses dynamic partition
    overwrite semantics on append so only the touched centroid partitions
    change (the batch analog of CDF's changed-rows-only sync).
    """
    wm = high_watermark(spark, index.path, id_col)
    fresh = source if wm is None else source.where(F.col(id_col) > wm)
    fresh = fresh.select(
        F.col(id_col), V.l2_normalize(vec_col).cast("array<float>").alias(vec_col)
    )
    assigned = assign_centroid(fresh, index.centroids, vec_col=vec_col)
    n = assigned.count()
    if n:
        assigned.write.mode("append").partitionBy("centroid_id").parquet(index.path)
    return n
