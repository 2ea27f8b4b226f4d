"""The reference's runtime QA summary (dags/sp500_dag.py.py:219-227)
as observation metrics: computed DURING the sink action, no second
pass — asserted here against a direct aggregate of the same frame."""

from __future__ import annotations

from pyspark.sql import functions as F

from sp500_stock_etl_spark.io.readers import load_table
from sp500_stock_etl_spark.operators.aggregates import attach_qa_observation


def test_observation_matches_direct_aggregate(spark, sf_correct):
    li = load_table(spark, sf_correct, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    observed, obs = attach_qa_observation(
        li, "l_orderkey", ["l_returnflag"]
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    direct = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("l_returnflag").isNull(), 1)).alias("nulls"),
        F.countDistinct("l_orderkey").alias("nd"),
    ).collect()[0]
    assert got["row_count"] == direct["n"]
    assert got["nulls_l_returnflag"] == direct["nulls"]
    # HLL at default rsd: within 5% of exact
    assert abs(got["approx_distinct_keys"] - direct["nd"]) / direct["nd"] < 0.05
