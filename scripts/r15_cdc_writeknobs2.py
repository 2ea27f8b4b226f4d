#!/usr/bin/env python
"""Interleaved (round-robin) A/B of per-WRITE-scoped knobs for the CDC
store's 256-file clustered write (r15, guide §1 interleaving to beat
the box's multi-minute contention windows). Knobs ride DataFrameWriter
.option(...) — they reach the per-write hadoop conf, so nothing global
changes.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sp500_stock_etl_spark.session import get_spark  # noqa: E402
from scripts.r15_cdc_stage_ab import N_OUT, keep_newest, synth  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("r15-cdc-writeknobs2")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="sg_r15_kn2_")
    store = os.path.join(base, "store")
    keep_newest(synth(spark, 0)).repartitionByRange(
        N_OUT, F.col("device_id")
    ).write.partitionBy("bucket").mode("overwrite").parquet(store)
    ckpt = keep_newest(
        spark.read.parquet(store).unionByName(synth(spark, 1))
    ).localCheckpoint()
    ckpt.count()

    combos = [
        ("base", {}),
        ("v2", {"mapreduce.fileoutputcommitter.algorithm.version": "2"}),
        ("nodict", {"parquet.enable.dictionary": "false"}),
        ("v2+nodict", {
            "mapreduce.fileoutputcommitter.algorithm.version": "2",
            "parquet.enable.dictionary": "false",
        }),
        ("v2+zstd", {
            "mapreduce.fileoutputcommitter.algorithm.version": "2",
            "compression": "zstd",
        }),
    ]
    walls: dict[str, list[float]] = {n: [] for n, _ in combos}

    def one(label, opts, r):
        out = os.path.join(base, f"o_{label}_{r}")
        w = ckpt.repartitionByRange(N_OUT, F.col("device_id")).write
        for k, v in opts.items():
            w = w.option(k, v)
        spark.sparkContext.setJobDescription(f"r15-kn2:{label}")
        t0 = time.perf_counter()
        w.partitionBy("bucket").mode("overwrite").parquet(out)
        walls[label].append(round(time.perf_counter() - t0, 3))
        shutil.rmtree(out, ignore_errors=True)

    for label, opts in combos:  # warmup
        one(label, opts, "w")
        walls[label].clear()
    for r in range(reps):
        for label, opts in combos:
            one(label, opts, r)
    spark.sparkContext.setJobDescription(None)
    for label, _ in combos:
        w = sorted(walls[label])
        print(
            f"{label:10s} best={w[0]:.3f} med={w[len(w) // 2]:.3f} "
            f"walls={walls[label]}"
        )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
