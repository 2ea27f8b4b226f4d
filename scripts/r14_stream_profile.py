#!/usr/bin/env python
"""Round-14 streaming profiler (guide §1/§7): runs one streaming
registry query and prints every micro-batch's durationMs breakdown
(queryPlanning / getBatch / addBatch / walCommit / commitOffsets /
latestOffset) plus state-operator metrics, via a listener that keeps
each progress event. Identifies WHERE micro-batch wall goes before
touching any plan.

Usage: python scripts/r14_stream_profile.py streaming_stream_stream_left_join
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("r14-stream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    progresses: list = []

    from pyspark.sql.streaming import StreamingQueryListener

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progresses.append(event.progress)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(_L())

    # Warmups (same as bench).
    registry["flagship_window_metrics"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()
    from sp500_stock_etl_spark.operators.multimodal import synthetic_png_corpus

    synthetic_png_corpus(spark, 2).write.format("noop").mode("overwrite").save()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        progresses.clear()
        t0 = time.perf_counter()
        registry[name].spark_fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        time.sleep(0.5)
        print(f"\n=== {name}: wall={wall:.2f}s, {len(progresses)} progress events")
        for p in progresses:
            d = dict(p.durationMs)
            rows = p.numInputRows
            ops = []
            for so in p.stateOperators:
                m = {
                    "op": so.operatorName,
                    "rowsTotal": so.numRowsTotal,
                    "updated": so.numRowsUpdated,
                    "updTimeMs": so.allUpdatesTimeMs,
                    "rmTimeMs": so.allRemovalsTimeMs,
                    "commitMs": so.commitTimeMs,
                    "mem": so.memoryUsedBytes,
                }
                ops.append(m)
            print(f"  batch={p.batchId} rows={rows} durationMs={json.dumps(d)}")
            for m in ops:
                print(f"    state: {json.dumps(m)}")


if __name__ == "__main__":
    main()
