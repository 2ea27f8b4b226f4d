"""Declarative expectations: one-pass violation counts + quarantine
annotation (operators/expectations.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sp500_stock_etl_spark.operators import expectations as E


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, "A"),   # breaks positive
            (3, 10.0, None),  # breaks flag_set (NULL rule result counts)
            (4, 200.0, "B"),  # breaks capped
            (5, -1.0, None),  # breaks positive + flag_set
        ],
        "id INT, v DOUBLE, flag STRING",
    )


def _rules():
    return {
        "positive": F.col("v") > 0,
        "capped": F.col("v") <= 100.0,
        "flag_set": F.col("flag").isNotNull(),
    }


def test_violation_counts(spark):
    row = E.violation_counts(_frame(spark), _rules()).collect()[0]
    assert row["row_count"] == 5
    assert row["positive"] == 2
    assert row["capped"] == 1
    assert row["flag_set"] == 2


def test_quarantine_rows_and_rule_lists(spark):
    rows = {
        r.id: r.failed_rules
        for r in E.quarantine(_frame(spark), _rules(), ["id"]).collect()
    }
    assert rows == {
        2: "positive",
        3: "flag_set",
        4: "capped",
        5: "flag_set,positive",  # sorted rule-name order
    }


def test_single_scan(spark):
    """The rule set must not multiply scans: exactly one scan node."""
    plan = (
        E.violation_counts(_frame(spark), _rules())
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("LogicalRDD") + plan.count("Relation") == 1
