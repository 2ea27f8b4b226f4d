#!/usr/bin/env python
"""One-off CBO join-reorder demonstration at bench scale (r8, r7
verdict item 6): same 3-table star as tests/test_cbo_join_flip.py,
run at $SPARK_GRAFT_SF_DIR (default sf0.1). Prints one JSON line with
the dim positions in the optimized plan before/after ANALYZE and the
flip verdict; recorded in BASELINE.md §10.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from sp500_stock_etl_spark.io.readers import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("cbo-flip-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    tables = ("t_flip_fact", "t_flip_dim_part", "t_flip_dim_cust")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_partkey", "o_custkey", "l_extendedprice"
    ).write.saveAsTable("t_flip_fact")
    load_table(spark, sf_dir, "part").write.saveAsTable("t_flip_dim_part")
    load_table(spark, sf_dir, "customer").write.saveAsTable("t_flip_dim_cust")

    def star():
        f = spark.table("t_flip_fact")
        p = spark.table("t_flip_dim_part")
        c = spark.table("t_flip_dim_cust").where(
            F.col("c_mktsegment") == "BUILDING"
        )
        return (
            f.join(p, f.l_partkey == p.p_partkey)
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("p_brand")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )

    def pos():
        plan = star()._jdf.queryExecution().optimizedPlan().toString()
        return {
            t: plan.find(t)
            for t in ("t_flip_dim_part", "t_flip_dim_cust")
        }

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024))
    spark.conf.set("spark.sql.cbo.enabled", "false")
    before = pos()

    for t in tables:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
    spark.sql(
        "ANALYZE TABLE t_flip_dim_cust COMPUTE STATISTICS "
        "FOR COLUMNS c_custkey, c_mktsegment"
    )
    spark.sql(
        "ANALYZE TABLE t_flip_dim_part COMPUTE STATISTICS "
        "FOR COLUMNS p_partkey"
    )
    spark.sql(
        "ANALYZE TABLE t_flip_fact COMPUTE STATISTICS "
        "FOR COLUMNS l_partkey, o_custkey"
    )
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    after = pos()

    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    print(
        json.dumps(
            {
                "probe": "cbo_flip",
                "sf_dir": sf_dir,
                "written_order_kept_without_stats": before[
                    "t_flip_dim_part"
                ]
                < before["t_flip_dim_cust"],
                "selective_dim_first_with_stats": after[
                    "t_flip_dim_cust"
                ]
                < after["t_flip_dim_part"],
                "pos_before": before,
                "pos_after": after,
                "sec": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
