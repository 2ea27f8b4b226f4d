#!/usr/bin/env python
"""Stateful-floor audit for Python-stateful plans (r15, r14 verdict
item 7): does streaming_running_totals_final (applyInPandasWithState —
its hot path is Python workers, so the partition floor is also the
Python parallelism) want a cores-derived floor instead of 4?

Interleaved A/B via the SPARK_GRAFT_STREAM_SHUFFLE override that
_stream_shuffle_partitions reads per query invocation.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or ["streaming_running_totals_final"]
    sf = "/root/testdata/sf0.1"
    spark = get_spark("r15-floor-ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    arms = ["4", "8", "16"]
    for name in names:
        q = registry[name]
        noop(q.spark_fn(spark, sf))  # warm (default rule)
        walls = {a: [] for a in arms}
        try:
            for r in range(reps):
                for a in arms:
                    os.environ["SPARK_GRAFT_STREAM_SHUFFLE"] = a
                    spark.sparkContext.setJobDescription(f"r15-floor:{name}:{a}")
                    t0 = time.perf_counter()
                    noop(q.spark_fn(spark, sf))
                    walls[a].append(round(time.perf_counter() - t0, 3))
        finally:
            os.environ.pop("SPARK_GRAFT_STREAM_SHUFFLE", None)
            spark.sparkContext.setJobDescription(None)
        for a in arms:
            w = sorted(walls[a])
            print(
                f"{name} parts={a:3s} best={w[0]:.3f} "
                f"med={w[len(w) // 2]:.3f} walls={walls[a]}"
            )


if __name__ == "__main__":
    main()
