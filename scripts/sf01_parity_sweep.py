#!/usr/bin/env python
"""Rotating sf0.1 parity spot-check (round-6 verdict item 5): re-verify
a per-round sample of the STALEST-at-sf0.1 queries against DuckDB at
the bench scale (10x the driver's correctness scale), so bench-scale
parity ages the way driver-row freshness does. r1 checked 8 heavy
queries, r6 checked its own 20 additions; from r7 on, each round
sweeps ~20 queries that have never (or longest-ago) been checked at
sf0.1, recorded in BASELINE.md.

Usage: python scripts/sf01_parity_sweep.py name1 name2 ...
       (no args -> the round-7 sample below)
Prints one JSON line: per-query ok/fail + totals.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Round-8 sample: the r8 births + oracle upgrades plus the stalest
# r3 greens (freshness maintenance after the r7 full sf0.1
# certification); results recorded in BASELINE.md SS10.
R8_SAMPLE = [
    "multimodal_resize_execute",
    "multimodal_pcm_chunk_execute",
    "tpcds_q38_channel_intersect",
    "tpcds_q87_channel_except",
    "tpcds_q14_cross_channel_items",
    "streaming_stream_stream_right_join",
    "streaming_running_totals_final",
    "multimodal_decode_features",
    "token_heavy_hitters_sketch",
    "approx_monitoring_profile",
    "streaming_quote_feed_agg",
    "string_functions_suite",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q13_custdist",
    "tpch_q19_disjunctive_join",
    "tpch_q22_idle_segments",
    "tpch_q4_priority_exists",
    "variant_json_agg",
    "weighted_avg_pricing",
    "multimodal_jpeg_decode_execute",  # late-r8 birth
    "multimodal_mjpeg_frame_decode",  # late-r8 birth
    "quality_classifier_inference",  # late-r8 birth
    "corpus_domain_mixture",  # late-r8 birth
    "unpivot_measures_long",  # late-r8 birth
]


def main() -> None:
    from pyspark.sql import SparkSession

    from sp500_stock_etl_spark.plans.registry import all_queries
    from tests.parity import compare, duckdb_connect

    names = sys.argv[1:] or R8_SAMPLE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("sf01-parity-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    con = duckdb_connect(sf_dir)
    t0 = time.time()
    results = {}
    for name in names:
        q = registry[name]
        try:
            d = q.spark_fn(spark, sf_dir)
            if q.oracle is None:
                results[name] = "rows_only:%d" % d.count()
                continue
            ok, msg = compare(d, con, q.oracle)
            results[name] = "ok" if ok else f"FAIL {msg[:120]}"
        except Exception as ex:  # noqa: BLE001
            results[name] = f"ERROR {str(ex)[:120]}"
    # rows_only is a SUCCESS class (r7-advice fix: it was silently
    # counted in n_fail), reported under its own counter.
    n_ok = sum(1 for v in results.values() if v == "ok")
    n_rows_only = sum(
        1 for v in results.values() if v.startswith("rows_only")
    )
    from sp500_stock_etl_spark.hostinfo import host_stamp

    print(json.dumps({
        "probe": "sf01_parity_sweep",
        "sf_dir": sf_dir,
        **host_stamp(),
        "n": len(names),
        "n_ok": n_ok,
        "n_rows_only": n_rows_only,
        "n_fail": len(names) - n_ok - n_rows_only,
        "sec": round(time.time() - t0, 1),
        "results": results,
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
