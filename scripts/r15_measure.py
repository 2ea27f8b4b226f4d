#!/usr/bin/env python
"""Round-14 optimization measurement helper (guide §1).

Times individual registry queries with the exact bench methodology
(noop sink, warmup absorbed, best-of-N) and optionally dumps
`.explain("formatted")` to plans/r15/<query>_<tag>.txt so before/after
plan claims are committed evidence.

Usage:
    python scripts/r15_measure.py [--reps 3] [--explain TAG] [--sf DIR] q1 q2 ...
    python scripts/r15_measure.py --explain before dedup_prefix_jaccard
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402
from sp500_stock_etl_spark.hostinfo import host_mt_ms, host_st_ms  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG",
                    help="dump explain('formatted') to plans/r15/<q>_<TAG>.txt")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-time", action="store_true",
                    help="explain only, skip timed runs")
    args = ap.parse_args()

    spark = get_spark("r15-measure")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # Same warmups as bench.py: JVM/codegen + Python worker pool.
    registry["flagship_window_metrics"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()
    from sp500_stock_etl_spark.operators.multimodal import synthetic_png_corpus

    synthetic_png_corpus(spark, 2).write.format("noop").mode("overwrite").save()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(root, "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in args.queries:
        q = registry[name]
        if args.explain:
            df = q.spark_fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.explain}.txt"), "w") as f:
                f.write(buf.getvalue())
        if args.no_time:
            continue
        walls = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"r15:{name}")
            t0 = time.perf_counter()
            q.spark_fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(walls), "walls": walls}
        print(f"{name}: best={min(walls)} walls={walls}", flush=True)

    print(json.dumps({
        "host_st_ms": host_st_ms(),
        "host_mt_ms": host_mt_ms(),
        "sf": args.sf,
        "timings": out,
    }))


if __name__ == "__main__":
    main()
