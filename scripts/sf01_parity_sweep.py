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

# Round-7 sample: 20 oracle-bearing queries with no prior sf0.1 check,
# drawn from the stalest driver rounds (r2-r3 greens; see
# scripts/coverage_report.py stalest_ok).
R7_SAMPLE = [
    "date_parts_agg",
    "doc_fingerprint",
    "hierarchical_rollup_daily",
    "json_props_agg",
    "jsonl_source_agg",
    "map_entries_agg",
    "range_window_trailing_spend",
    "similarity_ivf_topk",
    "asof_join_events",
    "conditional_agg_suite",
    "corpus_balanced_sample",
    "corpus_decontamination",
    "corpus_mix_sample",
    "corpus_pii_redaction",
    "corpus_token_budget",
    "dq_quarantine_rows",
    "dq_violation_counts",
    "percent_of_total",
    "quote_feed_source_agg",
    "ranking_function_suite",
]


def main() -> None:
    from pyspark.sql import SparkSession

    from sp500_stock_etl_spark.plans.registry import all_queries
    from tests.parity import compare, duckdb_connect

    names = sys.argv[1:] or R7_SAMPLE
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
    print(json.dumps({
        "probe": "sf01_parity_sweep",
        "sf_dir": sf_dir,
        "n": len(names),
        "n_ok": n_ok,
        "n_rows_only": n_rows_only,
        "n_fail": len(names) - n_ok - n_rows_only,
        "sec": round(time.time() - t0, 1),
        "results": results,
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
