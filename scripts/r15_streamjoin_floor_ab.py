#!/usr/bin/env python
"""Interleaved A/B: stateful shuffle-partition count for the
stream-stream join family (r14 floor = 4; r15 audit extended
cores-derived floors to python_stateful/heavy_state plans — this
script asks whether the two-sided join state would also prefer more
partitions). Uses the documented SPARK_GRAFT_STREAM_SHUFFLE override,
mutated in-process between reps (read per query invocation)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.caching import release_caches  # noqa: E402
from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

PLANS = [
    "streaming_stream_stream_left_join",
    "streaming_stream_stream_right_join",
    "streaming_stream_stream_full_join",
]
ARMS = ["4", "8", "16"]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-ssjoin-floor")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        registry[name].spark_fn(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        release_caches()
        return round(wall, 3)

    walls = {n: {a: [] for a in ARMS} for n in PLANS}
    for n in PLANS:  # warm
        run(n)
    for _ in range(reps):
        for arm in ARMS:
            os.environ["SPARK_GRAFT_STREAM_SHUFFLE"] = arm
            for n in PLANS:
                spark.sparkContext.setJobDescription(f"r15-ssjoin:{arm}:{n}")
                walls[n][arm].append(run(n))
    os.environ.pop("SPARK_GRAFT_STREAM_SHUFFLE", None)
    spark.sparkContext.setJobDescription(None)
    for n in PLANS:
        line = f"{n:40s}"
        for arm in ARMS:
            w = sorted(walls[n][arm])
            line += f"  p{arm} best={w[0]:.3f} med={w[len(w) // 2]:.3f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
