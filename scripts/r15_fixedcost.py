#!/usr/bin/env python
"""Fixed-cost attribution for the core suite (r15, r14 verdict item
5): the 8-core driver run beat the 32-core run at sf0.1, so the suite
is dominated by per-plan fixed costs. Split each core plan's wall into

  build   spark_fn() returning the DataFrame (driver-side plan
          construction incl. any eager staging/collect work)
  plan    forcing queryExecution().executedPlan() (analysis +
          optimization + physical planning; codegen not yet)
  exec    the noop action on the already-planned frame (codegen
          compile-or-cache-hit + job scheduling + data work)

and print the suite-level shares. Streaming/store plans do their real
work inside spark_fn (availableNow runs, foreachBatch merges), so
their 'build' IS execution — they are reported but flagged, and the
share summary is computed over the pure-batch plans where the split
is meaningful.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CORE_QUERIES, EXHIBIT_QUERIES  # noqa: E402
from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-fixedcost")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    registry["flagship_window_metrics"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()
    from sp500_stock_etl_spark.operators.multimodal import synthetic_png_corpus

    synthetic_png_corpus(spark, 2).write.format("noop").mode(
        "overwrite"
    ).save()

    rows = []
    for name in CORE_QUERIES:
        if name in EXHIBIT_QUERIES:
            continue
        q = registry[name]
        spark.sparkContext.setJobDescription(f"r15-fixed:{name}")
        t0 = time.perf_counter()
        df = q.spark_fn(spark, sf)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        streaming = name.startswith("streaming_")
        rows.append(
            {
                "name": name,
                "build": round(t1 - t0, 3),
                "plan": round(t2 - t1, 3),
                "exec": round(t3 - t2, 3),
                "streaming": streaming,
            }
        )
        print(
            f"{name:40s} build={t1 - t0:6.3f} plan={t2 - t1:6.3f} "
            f"exec={t3 - t2:6.3f}{'  [stream/store: build==work]' if streaming else ''}",
            flush=True,
        )
    spark.sparkContext.setJobDescription(None)

    batch = [r for r in rows if not r["streaming"]]
    tb = sum(r["build"] for r in batch)
    tp = sum(r["plan"] for r in batch)
    te = sum(r["exec"] for r in batch)
    tot = tb + tp + te
    print(
        json.dumps(
            {
                "n_batch_plans": len(batch),
                "build_s": round(tb, 2),
                "plan_s": round(tp, 2),
                "exec_s": round(te, 2),
                "build_share": round(tb / tot, 3),
                "plan_share": round(tp / tot, 3),
                "exec_share": round(te / tot, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
