#!/usr/bin/env python
"""Targeted oracle-parity re-check for round-14 optimization edits.

Runs the named registry queries against the DuckDB oracle exactly like
the grading driver (tests/parity.py::compare) at the given SF dir —
the fast re-certification loop after touching an operator's internals.

Usage:
    python scripts/r14_parity.py [--sf /root/testdata/sf0.01] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from tests.parity import compare, duckdb_connect

    spark = get_spark("r14-parity")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(args.sf)
    registry = all_queries()

    fails = []
    for name in args.queries:
        q = registry[name]
        if q.oracle is None:
            n = q.spark_fn(spark, args.sf).count()
            print(f"{name}: rows-only, {n} rows", flush=True)
            continue
        ok, msg = compare(q.spark_fn(spark, args.sf), con, q.oracle)
        print(f"{name}: {'OK' if ok else 'FAIL ' + msg[:300]}", flush=True)
        if not ok:
            fails.append(name)
    print(f"TOTAL {len(args.queries)} checked, {len(fails)} FAIL")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
