"""Cost-based-optimizer statistics plumbing (SURVEY §4.1 ext): at
100 TB the difference between a broadcast and a shuffled join — and
between a good and a terrible join order — is ANALYZE TABLE feeding
the CBO. The engine never needed custom CBO work (Catalyst ships it),
but the repo should PROVE the plumbing works: table row counts land
in the catalog and the optimized plan, column stats carry distinct
counts, and with CBO on a filter's cardinality estimate actually uses
them (selectivity < 1) — that estimate is what flips join sides and
orders at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sp500_stock_etl_spark.io.readers import load_table


@pytest.fixture()
def analyzed_orders(spark, sf_dir):
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    spark.sql("DROP TABLE IF EXISTS t_cbo_orders")
    od.write.saveAsTable("t_cbo_orders")
    yield od.count()
    spark.sql("DROP TABLE IF EXISTS t_cbo_orders")


def _row_count_stat(spark, df):
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    # py4j auto-converts scala BigInt through get(); str() is the
    # portable bridge for either a BigInt proxy or a plain int.
    return int(str(rc.get())) if rc.isDefined() else None


def test_analyze_table_feeds_plan_row_count(spark, analyzed_orders):
    n = analyzed_orders
    spark.sql("ANALYZE TABLE t_cbo_orders COMPUTE STATISTICS")
    # Plan-level rowCount only propagates under the CBO flag; without
    # it only sizeInBytes flows (which is why ANALYZE without
    # cbo.enabled buys nothing at plan time).
    prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        got = _row_count_stat(spark, spark.table("t_cbo_orders"))
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)
    assert got == n, f"catalog rowCount {got} != actual {n}"


def test_column_stats_recorded_and_drive_filter_selectivity(
    spark, analyzed_orders
):
    n = analyzed_orders
    spark.sql(
        "ANALYZE TABLE t_cbo_orders COMPUTE STATISTICS "
        "FOR COLUMNS o_orderpriority, o_custkey"
    )
    desc = {
        r["info_name"]: r["info_value"]
        for r in spark.sql(
            "DESCRIBE EXTENDED t_cbo_orders o_orderpriority"
        ).collect()
    }
    ndv = int(desc["distinct_count"])
    # 5 priorities in TPC-H-ish data; HLL estimate must be sane.
    assert 1 <= ndv <= 10, desc

    prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        filtered = spark.table("t_cbo_orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        est = _row_count_stat(spark, filtered)
        # With column stats + CBO the estimate is ~n/ndv, far below n;
        # without stats the estimate would be the full row count (or
        # undefined). Allow generous slack for the HLL ndv estimate.
        assert est is not None and est < n * 0.8, (est, n)
        assert est > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)
