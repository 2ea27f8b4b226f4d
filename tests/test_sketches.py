"""Error bounds for the sketch-based monitoring profile
(approx_monitoring_profile): sketches can't hash-match a DuckDB
oracle, so correctness here means bounded relative error against the
exact answers computed in the same session.

HLL++ at rsd=0.01 has a standard error of ~1%; we allow 5x that.
approx_percentile at accuracy=10000 guarantees rank error <=
n/10000; for the sf0.01 lineitem (~60k rows) that is tight, so we
check the approximate quantile lands between the exact neighbors a
generous rank band away.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sp500_stock_etl_spark.io.readers import load_table
from sp500_stock_etl_spark.plans.registry import all_queries


def test_approx_distinct_error_bounded(spark, sf_correct):
    row = all_queries()["approx_monitoring_profile"].spark_fn(
        spark, sf_correct
    ).collect()[0]
    li = load_table(spark, sf_correct, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row["n_rows"] == exact["n"]
    for approx, true in [
        (row["approx_orders"], exact["orders"]),
        (row["approx_parts"], exact["parts"]),
    ]:
        assert abs(approx - true) / true < 0.05, (approx, true)


def test_approx_percentile_rank_bounded(spark, sf_correct):
    row = all_queries()["approx_monitoring_profile"].spark_fn(
        spark, sf_correct
    ).collect()[0]
    li = load_table(spark, sf_correct, "lineitem")
    n = li.count()
    prices = F.col("l_extendedprice")
    quantiles = [row["price_p50"], row["price_p95"], row["price_p99"]]
    for p, approx in zip([0.5, 0.95, 0.99], quantiles):
        # rank of the approximate answer must be within ±1% of p*n
        rank = li.where(prices <= F.lit(approx)).count()
        assert abs(rank - p * n) <= 0.01 * n + 1, (p, approx, rank, p * n)
