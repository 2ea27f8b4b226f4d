"""Error bounds for the sketch-based monitoring profile.

Since the r8 oracle upgrade, the REGISTERED query
(approx_monitoring_profile) emits the deterministic certificate
(exact counts + in-query bound flags) and is hash-checked by the
driver; these tests keep the RAW estimators honest against exact
answers computed in the same session, and pin the certificate's
flags.

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


def _raw_profile(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), 10000).alias("price_p50"),
        F.approx_percentile("l_extendedprice", F.lit(0.95), 10000).alias("price_p95"),
        F.approx_percentile("l_extendedprice", F.lit(0.99), 10000).alias("price_p99"),
        F.count(F.lit(1)).alias("n_rows"),
    ).collect()[0]


def test_approx_distinct_error_bounded(spark, sf_correct):
    row = _raw_profile(spark, sf_correct)
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
    row = _raw_profile(spark, sf_correct)
    li = load_table(spark, sf_correct, "lineitem")
    n = li.count()
    prices = F.col("l_extendedprice")
    quantiles = [row["price_p50"], row["price_p95"], row["price_p99"]]
    for p, approx in zip([0.5, 0.95, 0.99], quantiles):
        # rank of the approximate answer must be within ±1% of p*n
        rank = li.where(prices <= F.lit(approx)).count()
        assert abs(rank - p * n) <= 0.01 * n + 1, (p, approx, rank, p * n)


def test_certificate_flags_all_green(spark, sf_correct):
    """The registered certificate query must report every sketch
    inside its error contract (the driver hashes exactly this)."""
    row = all_queries()["approx_monitoring_profile"].spark_fn(
        spark, sf_correct
    ).collect()[0]
    for flag in (
        "hll_orders_ok", "hll_parts_ok",
        "p50_rank_ok", "p95_rank_ok", "p99_rank_ok",
    ):
        assert row[flag] == 1, (flag, row)
    assert row["exact_orders"] > 0 and row["exact_parts"] > 0
