"""Physical-plan auditing (SURVEY.md §4.2 — "the plan you'd want").

At 100 TB the difference between a right plan and a wrong one is the job:
a scan that reads all columns for a 2-column projection, a sort-merge join
where a broadcast was available, or a global sort for a top-k are all
silent order-of-magnitude regressions.  These helpers make plan shape a
*testable property* so CI catches plan regressions the way it catches
wrong answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """At least one scan received pushdown-able predicates.  Per-scan, not
    all-scans: a filtered fact joined to an unfiltered dimension prints
    'PushedFilters: []' for the dim scan, which must not mask the fact
    scan's real pushdown."""
    import re

    s = plan_string(df)
    return any(
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", s)
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    import re

    s = plan_string(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", s):
        cols.extend(p.split(":")[0].strip() for p in m.group(1).split(",") if p.strip())
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df) or "BroadcastNestedLoopJoin" in plan_string(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_string(df)


def uses_take_ordered(df: DataFrame) -> bool:
    """ORDER BY + LIMIT planned as TakeOrderedAndProject (per-partition
    heap, no global sort)."""
    return "TakeOrderedAndProject" in plan_string(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better; 0 means
    the whole plan fell out of codegen."""
    import re

    s = plan_string(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", s)
    return int(m.group(1)) if m else 0


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the plan: Exchange nodes minus broadcast exchanges
    (no big-side repartition) minus reused exchanges (reference an already
    -counted exchange's output — no new shuffle executes)."""
    s = plan_string(df, "simple")
    return (
        s.count("Exchange")
        - s.count("BroadcastExchange")
        - s.count("ReusedExchange")
    )


def audit(df: DataFrame) -> dict:
    """One-call plan summary for notebooks/tests."""
    return {
        "pushed_filters": has_pushed_filters(df),
        "read_columns": read_schema_columns(df),
        "broadcast_join": uses_broadcast_join(df),
        "sort_merge_join": uses_sort_merge_join(df),
        "take_ordered": uses_take_ordered(df),
        "codegen_spans": whole_stage_codegen_spans(df),
        "shuffles": count_exchanges(df),
    }
