"""PySpark-native analytics engine with the capabilities of
LombMarc/vector-search-databricks-poc, rebuilt Spark-first.

The reference (at /root/reference, surveyed in SURVEY.md) is a vector-search /
RAG proof-of-concept on Databricks: ingest documents -> embed with a
pandas_udf -> build a delta-sync vector index -> serve top-k similarity
search.  This package re-expresses that surface — plus the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis) —
as declarative PySpark DataFrame plans designed for 100 TB scale:

- ``session``    SparkSession factory (AQE, Arrow, sane shuffle defaults)
- ``catalog``    fixture/table loading conventions (reference syntetic_data.py:32-35)
- ``vectors``    expression-only vector algebra (dot/cosine/l2/normalize)
- ``operators``  top-k search, batch similarity join, index build, dedup,
                 text analysis, reranking, incremental refresh, RAG assembly
- ``functions``  embedding encoders (pandas_udf boundary), multimodal plumbing
- ``sources``    external ingest (arXiv-shaped HTTP source, reference
                 syntetic_data_arxiv.py:75-129)
- ``streaming``  event-time windows, watermarks, streaming dedup
"""

__version__ = "0.1.0"
