"""Result post-processing + RAG context assembly (SURVEY.md A13/A14).

The reference post-processes top-k hits in driver Python — drop empty texts,
drop exact-duplicate texts with a ``seen`` set, keep {id, text}
(main.py:59-70) — then formats "[{id}] {text}" blocks joined by blank lines
with a fallback string (main.py:98-104).  Same semantics, declarative:
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clean_hits(df: DataFrame, id_col: str = "vec_id", text_col: str = "text",
               score_col: str | None = None) -> DataFrame:
    """A13: null/empty filter + exact text dedup (deterministic keeper =
    min id, where the reference keeps first-seen) + projection.

    ``score_col`` optionally survives the dedup (best score among the
    duplicates) so downstream context assembly can order by relevance."""
    aggs = [F.min(id_col).alias(id_col)]
    if score_col is not None:
        aggs.append(F.max(score_col).alias(score_col))
    keep = (
        df.where(F.col(text_col).isNotNull() & (F.col(text_col) != ""))
        .groupBy(text_col)
        .agg(*aggs)
    )
    cols = [id_col, text_col] + ([score_col] if score_col is not None else [])
    return keep.select(*cols)


def assemble_context(df: DataFrame, id_col: str = "vec_id", text_col: str = "text",
                     order_col: str | None = None,
                     ascending: bool = True) -> DataFrame:
    """A14: one-row DataFrame with the "[id] text\n\n…" context block;
    empty input yields the reference's fallback string (main.py:104).

    Ordering is enforced AFTER the aggregate: collect_list gives no order
    guarantee across the partial-aggregate shuffle merge, so we collect
    (order_key, formatted) structs and sort_array them — deterministic on
    any partitioning.  Pass ``order_col`` + ``ascending=False`` for
    relevance scores (most-relevant-first, the reference's prompt order) —
    the default ascending sort would otherwise LEAD with the worst hit."""
    key = F.col(order_col if order_col else id_col)
    item = F.struct(
        key.alias("k"),
        F.format_string("[%s] %s", F.col(id_col), F.col(text_col)).alias("fmt"),
    )
    blocks = df.agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(item), asc=ascending),
                lambda x: x["fmt"],
            ),
            "\n\n",
        ).alias("context")
    )
    return blocks.select(
        F.when(F.col("context") == "", F.lit("No relevant context found."))
        .otherwise(F.col("context"))
        .alias("context")
    )
