"""Declarative data-contract validation (expectations-lite).

The reference trusts its managed tables; a standalone ingest pipeline
needs the gate: "does this batch satisfy the contract?" before it is
admitted.  Row-level rules compile into ONE conditional-aggregation pass
over the table (a single scan, no matter how many rules); uniqueness is
count − count_distinct inside the same pass; referential rules add one
anti-join each against the (broadcast) dimension keys.  The report is a
tiny DataFrame — (rule, violations, total, ok) — suitable for gating a
write or alerting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return (
        f"in_range({col},{lo},{hi})",
        F.col(col).isNotNull() & ~F.col(col).between(lo, hi),
    )


def matches(col: str, pattern: str) -> tuple[str, Column]:
    return (
        f"matches({col})",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def one_of(col: str, allowed: list) -> tuple[str, Column]:
    return (
        f"one_of({col})",
        F.col(col).isNotNull() & ~F.col(col).isin(list(allowed)),
    )


def validate_table(
    df: DataFrame,
    row_rules: list[tuple[str, Column]] | None = None,
    unique_cols: list[str] | None = None,
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Contract report: one row per rule with its violation count.

    - ``row_rules``: (name, violation_condition) pairs — built with the
      helpers above or any boolean Column; ALL are evaluated in one
      aggregate pass (conditional sums over a single scan).
    - ``unique_cols``: columns that must be unique among non-null values;
      violations = count − count_distinct, same single pass.
    - ``references``: (fact_col, dim_df, dim_col) referential-integrity
      rules; each costs one anti-join against the DISTINCT dimension keys
      (broadcast — dimension key sets are small by definition).

    All legs are lazy and unioned into one report plan; ``ok`` is
    violations == 0.  At 100 TB the row-rule pass is a map-side
    partial-agg scan; adding a rule adds a column, not a job.
    """
    row_rules = row_rules or []
    unique_cols = unique_cols or []
    references = references or []
    if not (row_rules or unique_cols or references):
        raise ValueError("no rules given")

    legs = []
    if row_rules or unique_cols:
        aggs = [F.count(F.lit(1)).alias("_total")]
        for name, cond in row_rules:
            aggs.append(F.sum(cond.cast("long")).alias(f"_v_{name}"))
        for col in unique_cols:
            aggs.append(
                (F.count(col) - F.count_distinct(F.col(col))).alias(
                    f"_v_unique({col})"
                )
            )
        one = df.agg(*aggs)
        names = [n for n, _ in row_rules] + [f"unique({c})" for c in unique_cols]
        legs.append(
            one.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(n).alias("rule"),
                                F.coalesce(F.col(f"`_v_{n}`"), F.lit(0)).alias(
                                    "violations"
                                ),
                                F.col("_total").alias("total"),
                            )
                            for n in names
                        ]
                    )
                ).alias("r")
            ).select("r.rule", "r.violations", "r.total")
        )
    # one total for ALL referential legs — recomputing df.count() per
    # reference would add a full fact-table scan per rule
    total = df.agg(F.count(F.lit(1)).alias("total")) if references else None
    for fact_col, dim_df, dim_col in references:
        missing = df.where(F.col(fact_col).isNotNull()).join(
            F.broadcast(
                dim_df.select(F.col(dim_col).alias(fact_col)).distinct()
            ),
            fact_col,
            "left_anti",
        )
        legs.append(
            missing.agg(F.count(F.lit(1)).alias("violations"))
            .join(F.broadcast(total))
            .select(
                F.lit(f"ref({fact_col}->{dim_col})").alias("rule"),
                "violations",
                "total",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.select(
        "rule", "violations", "total", (F.col("violations") == 0).alias("ok")
    ).orderBy("rule")
