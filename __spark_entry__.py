"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (top-k cosine similarity search,
SURVEY.md §7.1) on sf0.001.  ``queries()`` maps every implemented operator
from SURVEY.md §2 to a (spark, sf_dir) -> DataFrame callable; ``oracle_sql()``
gives the DuckDB-equivalent SQL for each hash-checkable query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the harness's working directory
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_search_databricks_poc_spark import queries_registry as R  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return R.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(R.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(R.ORACLE_SQL)
