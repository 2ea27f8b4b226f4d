#!/usr/bin/env python
"""arrow_udtf_installments profile (r15, r14 verdict item 4):

1. attribute the wall — time the query's input subtree (scan +
   repartition, no UDTF) vs the full lateral UDTF plan;
2. interleaved A/B of spark.sql.execution.arrow.maxRecordsPerBatch
   512 (session pin, sized for fat multimodal rows) vs larger batches
   for this skinny 2-column fan-out.

The conf is set AFTER the plan is built (harden() inside the registry
wrapper re-pins 512 during spark_fn) and restored after each action —
Arrow batch size is read at execution, not plan-build, time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf = "/root/testdata/sf0.1"
    spark = get_spark("r15-udtf-ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    q = registry["arrow_udtf_installments"]

    # Attribution: input subtree without the UDTF (same scan +
    # explicit repartition the SQL applies).
    from sp500_stock_etl_spark.io.readers import register_views

    register_views(spark, sf)
    parts = spark.sparkContext.defaultParallelism
    input_only = spark.sql(
        f"""SELECT /*+ REPARTITION({parts}) */ o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents,
               CAST(1 + o_orderkey % 6 AS INT) AS k
        FROM orders"""
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(input_only)
    walls_in = []
    for _ in range(3):
        t0 = time.perf_counter()
        noop(input_only)
        walls_in.append(round(time.perf_counter() - t0, 3))
    print(f"input-only (no UDTF): best={min(walls_in):.3f} walls={walls_in}")

    sizes = ["512", "4096", "10000"]
    walls = {s: [] for s in sizes}
    noop(q.spark_fn(spark, sf))  # warm
    for r in range(reps):
        for s in sizes:
            df = q.spark_fn(spark, sf)  # harden() re-pins 512 here
            spark.conf.set(CONF, s)
            try:
                spark.sparkContext.setJobDescription(f"r15-udtf:{s}")
                t0 = time.perf_counter()
                noop(df)
                walls[s].append(round(time.perf_counter() - t0, 3))
            finally:
                spark.conf.set(CONF, "512")
    spark.sparkContext.setJobDescription(None)
    for s in sizes:
        w = sorted(walls[s])
        print(f"batch={s:6s} best={w[0]:.3f} med={w[len(w) // 2]:.3f} walls={walls[s]}")


if __name__ == "__main__":
    main()
