"""Harness simulation: the driver creates its OWN SparkSession with none of
our session.py configs.  Every query must still run and oracle-match —
catalog._ensure_conf must cover the gap (ns timestamps, timezone)."""

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# plain session — deliberately NOT vector_search_databricks_poc_spark.session
spark = SparkSession.builder.master("local[4]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E
from tests.oracle_utils import duck_connection, compare

assert E.entry(spark).count() > 0

sf = "/root/testdata/sf0.001"
con = duck_connection(sf)
# events-dependent queries are the config-sensitive ones + a vector query
for name in ["event_window_suite", "stream_window_suite",
             "topk_cosine_search", "agg_stats_suite"]:
    r = compare(E.queries()[name](spark, sf), con, E.oracle_sql()[name])
    assert r["values_match"], (name, r)
print("DRIVER_SIM_OK")
"""


def test_plain_session_harness():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert "DRIVER_SIM_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]


def test_rows_only_outputs_canonicalize(spark):
    """The driver's rows-only check sorts a pandas frame over all output
    columns — r1's `hashing_embed` crashed it with an array<float> column
    ("unhashable type: list").  Replicate that canonicalization for every
    rows-only declared query so the failure mode can't regress."""
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    sf = "/root/testdata/sf0.001"
    for name in [k for k in q if k not in o]:
        pdf = q[name](spark, sf).limit(200).toPandas()
        # the driver sorts by every column; lists/dicts/ndarrays break it
        pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
