"""arXiv-shaped external ingest (SURVEY.md A2 port).

The reference fetches arXiv Atom pages in a driver-side loop and cleans each
record with Python string ops (syntetic_data_arxiv.py:75-129).  Split into
two parts here:

1. ``clean_arxiv_fields`` — the per-record field extraction re-expressed as
   Catalyst expressions, so the cleanup runs distributed over a raw landing
   DataFrame (at 100 TB the fetcher writes raw files; cleanup is a Spark
   job, not driver code).
2. ``fetch_arxiv_paginated`` — the driver-side fetcher, kept only as a
   convenience for small corpora and gated behind an import-try (no network
   in tests; unit tests feed raw rows straight to the cleaner).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

RAW_SCHEMA = StructType(
    [
        StructField("raw_id", StringType()),       # e.g. "http://arxiv.org/abs/1234.5678v1"
        StructField("title", StringType()),
        StructField("summary", StringType()),
        StructField("authors_csv", StringType()),  # pre-joined or raw list repr
        StructField("category", StringType()),
        StructField("published", StringType()),
        StructField("link", StringType()),
    ]
)

ARXIV_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("title", StringType()),
        StructField("summary", StringType()),
        StructField("authors", StringType()),
        StructField("category", StringType()),
        StructField("published", StringType()),  # reference keeps dates as strings
        StructField("link", StringType()),
    ]
)


def clean_arxiv_fields(raw: DataFrame) -> DataFrame:
    """The reference's per-record Python transforms (syntetic_data_arxiv.py:87-105)
    as Catalyst expressions:

    - id:       ``entry.id.split('/abs/')[-1]``      -> element_at(split(..), -1)
    - title/summary: newline scrub + strip           -> regexp_replace + trim
    - authors:  ``", ".join(names)``                 -> pass-through csv (already joined)
    - category: default if missing                   -> coalesce
    - link:     ``.replace('abs/', 'pdf/')``         -> replace
    """
    return raw.select(
        F.element_at(F.split(F.col("raw_id"), "/abs/"), -1).alias("id"),
        F.trim(F.regexp_replace(F.col("title"), "\n", " ")).alias("title"),
        F.trim(F.regexp_replace(F.col("summary"), "\n", " ")).alias("summary"),
        F.coalesce(F.col("authors_csv"), F.lit("")).alias("authors"),
        F.coalesce(F.col("category"), F.lit("unknown")).alias("category"),
        F.col("published"),
        F.replace(F.col("link"), F.lit("abs/"), F.lit("pdf/")).alias("link"),
    )


def fetch_arxiv_paginated(
    spark: SparkSession,
    query: str = "cat:cs.LG",
    target_total: int = 1000,
    batch_size: int = 500,
    sleep_s: float = 1.0,
) -> DataFrame:
    """Paginated fetch (reference defaults: 500/page, 1 s politeness sleep,
    syntetic_data_arxiv.py:75,109).  Requires `feedparser` + network; absent
    either, raises ImportError/URLError — callers at scale land raw files
    and use ``clean_arxiv_fields`` instead."""
    import urllib.request

    try:
        import feedparser  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise ImportError("fetch_arxiv_paginated requires `feedparser`") from e

    rows = []
    start = 0
    while len(rows) < target_total:
        url = (
            "http://export.arxiv.org/api/query?search_query="
            f"{urllib.request.quote(query)}&start={start}&max_results={batch_size}"
        )
        feed = feedparser.parse(url)
        if not feed.entries:
            break
        for e in feed.entries:
            rows.append(
                (
                    e.id,
                    e.get("title"),
                    e.get("summary"),
                    ", ".join(a.name for a in e.get("authors", [])),
                    (e.get("tags") or [{}])[0].get("term"),
                    e.get("published"),
                    e.get("link"),
                )
            )
        start += batch_size
        time.sleep(sleep_s)
    raw = spark.createDataFrame(rows[:target_total], RAW_SCHEMA)
    return clean_arxiv_fields(raw)
