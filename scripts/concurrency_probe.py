#!/usr/bin/env python
"""Concurrency probe: the same session serving N queries AT ONCE
(driver threads sharing one SparkContext — the multi-tenant/BI-server
shape). Spark interleaves the jobs' tasks across the core pool, so
concurrent wall-clock should approach max(query) + scheduling, far
below the sequential sum. Prints one JSON line.

Usage: python scripts/concurrency_probe.py [threads]
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

QUERIES = [
    "grouped_agg_pricing",
    "broadcast_star_join",
    "fact_fact_join",
    "rolling_avg_sma7",
    "qa_aggregate",
    "hourly_event_agg",
    "text_quality_stats",
    "star_chain_q5",
]


def main() -> None:
    n_threads = int(sys.argv[1]) if len(sys.argv) > 1 else len(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("concurrency-probe")
    qs = all_queries()

    def run(name: str) -> float:
        t = time.time()
        qs[name].spark_fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t

    run(QUERIES[0])  # warmup

    seq = sum(run(n) for n in QUERIES)
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        list(ex.map(run, QUERIES))
    conc = time.time() - t0
    print(json.dumps({
        "probe": "concurrent_queries",
        "sf_dir": sf_dir,
        "n_queries": len(QUERIES),
        "threads": n_threads,
        "sequential_sec": round(seq, 2),
        "concurrent_sec": round(conc, 2),
        "speedup": round(seq / conc, 2),
    }))


if __name__ == "__main__":
    main()
