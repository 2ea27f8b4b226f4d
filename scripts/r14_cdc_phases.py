#!/usr/bin/env python
"""Profile the CDC manifest-store merge phases (round-14, guide §1).

Runs the filestats / sharded / tenant CDC queries once at the given SF
and prints each batch's merge observability dict (probe_s, resolve_s,
stage_write_s, stage_footers_s, commit_s, wall_s) so the per-batch
wall is attributed to a phase before any code is touched.
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
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("r14-cdc-phases")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    from sp500_stock_etl_spark.plans import queries_streaming as QS

    # Warmup: absorb JVM/codegen cost on the small SF first.
    registry["streaming_cdc_upsert_filestats"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()

    for name, stats_attr in [
        ("streaming_cdc_upsert_filestats", "_LAST_CDC_FILE_STATS"),
        ("streaming_cdc_upsert_sharded", "_LAST_CDC_SHARDED_STATS"),
        ("streaming_cdc_upsert_tenant", "_LAST_CDC_TENANT_STATS"),
    ]:
        t0 = time.perf_counter()
        registry[name].spark_fn(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.perf_counter() - t0, 3)
        stats = getattr(QS, stats_attr, None)
        print(f"== {name}: wall={wall}s")
        for i, st in enumerate(stats or []):
            print(f"  batch {i}: {json.dumps(st, default=str)}")


if __name__ == "__main__":
    main()
