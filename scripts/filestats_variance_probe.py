"""Localize the streaming_cdc_upsert_filestats run-to-run swing (r11
verdict item 1 prerequisite: 36.4 s committed vs ~12 s warm solo on
the same host — the fold value for the r12 anchor must not bake ~24 s
of noise into every future comparison).

Runs the query N times under the bench session and prints, per run:
total wall, the staging phase wall (4 coalesce(1) event chunk writes),
the stream wall, and each batch's merge stats (now carrying
``wall_s`` from merge_manifest_store) — so a swing is attributable to
(a) chunk staging I/O, (b) a specific batch's merge, or (c) the
Structured Streaming machinery between merges.

Usage: python scripts/filestats_variance_probe.py [n_runs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from sp500_stock_etl_spark.session import get_spark
    from sp500_stock_etl_spark.plans import queries_streaming as QS

    spark = get_spark("filestats-variance-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # Same warmups as bench.py so run 1 is comparable.
    from sp500_stock_etl_spark.plans.registry import all_queries

    registry = all_queries()
    registry["flagship_window_metrics"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()

    orig_stage = QS._stage_events_multibatch
    stage_wall = []

    def timed_stage(spark, sf_dir):
        t0 = time.perf_counter()
        out = orig_stage(spark, sf_dir)
        stage_wall.append(round(time.perf_counter() - t0, 3))
        return out

    QS._stage_events_multibatch = timed_stage
    try:
        for run in range(1, n_runs + 1):
            stage_wall.clear()
            t0 = time.perf_counter()
            QS.q_streaming_cdc_upsert_filestats(spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            total = round(time.perf_counter() - t0, 3)
            merges = [
                {
                    k: st.get(k)
                    for k in (
                        "generation",
                        "wall_s",
                        "files_read",
                        "files_total",
                        "bytes_read",
                        "pruning",
                        "commit_retries",
                        "phases",
                    )
                }
                for st in QS._LAST_CDC_FILE_STATS
            ]
            merge_sum = round(
                sum(m["wall_s"] or 0 for m in merges), 3
            )
            print(
                json.dumps(
                    {
                        "run": run,
                        "total_s": total,
                        "stage_s": stage_wall[0] if stage_wall else None,
                        "merge_sum_s": merge_sum,
                        "stream_overhead_s": round(
                            total - (stage_wall[0] or 0) - merge_sum, 3
                        ),
                        "merges": merges,
                    }
                ),
                flush=True,
            )
    finally:
        QS._stage_events_multibatch = orig_stage


if __name__ == "__main__":
    main()
