"""Arrow-UDTF cell of the §2.12 boundary matrix (round 9).

Oracle parity runs in tests/test_oracle_parity.py like every registry
query; these tests pin the properties parity can't see — the plan
shape (Arrow-evaluated table function over a pruned scan, no shuffle)
and the exactness invariant (installments reconstruct each order's
total to the cent).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sp500_stock_etl_spark.plans.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _q(spark):
    return all_queries()["arrow_udtf_installments"].spark_fn(spark, SF_DIR)


def test_udtf_plan_arrow_pruned_shuffle_below(spark):
    plan = _q(spark)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    # Exactly one exchange, and it sits BELOW the UDTF (children print
    # after parents): the round-robin spread of the skinny input that
    # gives the per-row eval its parallelism. Nothing shuffles the fat
    # fan-out output above.
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1
    assert plan.index("Exchange") > plan.index("ArrowEvalPythonUDTF")
    # column pruning reaches the scan: only the two inputs are read.
    scan = plan[plan.index("FileScan") :]
    assert "o_orderkey" in scan and "o_totalprice" in scan
    assert "o_custkey" not in scan.split("ReadSchema")[1][:200]


def test_udtf_installments_reconstruct_totals(spark):
    out = _q(spark)
    totals = out.groupBy("orderkey").agg(
        F.sum("amount_cents").alias("rebuilt"),
        F.count(F.lit(1)).alias("k"),
        (F.max("amount_cents") - F.min("amount_cents")).alias("spread"),
    )
    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.floor(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("total_cents"),
            (1 + F.col("o_orderkey") % 6).cast("bigint").alias("k_want"),
        )
    )
    j = totals.join(orders, "orderkey")
    n_orders = orders.count()
    assert j.count() == n_orders
    # every order's installments sum back to its exact total, the
    # fan-out matches k, and largest-remainder spreads by at most 1.
    bad = j.where(
        (F.col("rebuilt") != F.col("total_cents"))
        | (F.col("k") != F.col("k_want"))
        | (F.col("spread") > 1)
    )
    assert bad.count() == 0
