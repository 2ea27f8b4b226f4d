"""Declarative data-quality expectations (SURVEY §5.1 made
first-class): the reference defends itself with scattered runtime
checks (schema assert dags/sp500_dag.py.py:47, non-empty :64,
essential-field dropna :186, per-column null counts :223-227); here
the same intent is a RULE SET evaluated in one pass.

Two consumption shapes, both single-scan:

- ``violation_counts``: one row of per-rule violation counts plus the
  total — the monitoring feed (compare row_count vs rule columns to
  alert);
- ``quarantine``: the failing rows themselves, annotated with a
  comma-joined list of the rules they broke — the DLQ/repair feed
  (the engine version of ON_ERROR='CONTINUE', dags/sp500_dag.py.py:377,
  which discards the information this keeps).

Rules are plain boolean Columns (True = pass), so they stay inside
whole-stage codegen — a rule set of any width costs one scan, no UDFs,
no per-rule passes. At 100 TB that single-pass property is the whole
point: quality checking rides the ingest scan it already pays for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def violation_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row: row_count + per-rule violation counts (rule = True
    means the row passes; NULL rule results count as violations, the
    conservative reading)."""
    aggs = [F.count(F.lit(1)).alias("row_count")] + [
        F.sum(
            F.when(F.coalesce(rule, F.lit(False)), F.lit(0)).otherwise(F.lit(1))
        ).alias(name)
        for name, rule in rules.items()
    ]
    return df.agg(*aggs)


def quarantine(
    df: DataFrame, rules: dict[str, Column], keep_cols: list[str]
) -> DataFrame:
    """Rows failing at least one rule, with ``failed_rules`` = the
    comma-joined (deterministically ordered) names of every rule the
    row broke."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.coalesce(rule, F.lit(False)), F.lit(name)
                )
                for name, rule in sorted(rules.items())
            ]
        )
    )
    return (
        df.withColumn("failed_rules", F.array_join(failed, ","))
        .where(F.col("failed_rules") != "")
        .select(*keep_cols, "failed_rules")
    )
