#!/usr/bin/env python
"""Committer-version x write-parallelism matrix for the 256-file CDC
stage write (r15): if the cost is the v1 job commit's driver-side
sequential renames, v2 (task-commit moves) should scale with task
count while v1 does not.
"""

from __future__ import annotations

import glob
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("r15-cdc-commitmatrix")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="sg_r15_cm_")
    store = os.path.join(base, "store")
    keep_newest(synth(spark, 0)).repartitionByRange(
        N_OUT, F.col("device_id")
    ).write.partitionBy("bucket").mode("overwrite").parquet(store)
    ckpt = keep_newest(
        spark.read.parquet(store).unionByName(synth(spark, 1))
    ).localCheckpoint()
    ckpt.count()

    def shaped(tasks: str):
        if tasks == "4range":
            return ckpt.repartitionByRange(N_OUT, F.col("device_id"))
        if tasks == "64hash":
            return ckpt.repartition(64, F.col("bucket"))
        if tasks == "256range":
            return ckpt.repartitionByRange(256, F.col("bucket"), F.col("device_id"))
        raise ValueError(tasks)

    combos = [(v, t) for t in ("4range", "64hash", "256range") for v in ("1", "2")]
    walls: dict[tuple, list[float]] = {c: [] for c in combos}
    files: dict[tuple, int] = {}

    def one(c, r):
        v, t = c
        out = os.path.join(base, f"o_{v}_{t}_{r}")
        spark.sparkContext.setJobDescription(f"r15-cm:v{v}-{t}")
        t0 = time.perf_counter()
        (
            shaped(t)
            .write.option("mapreduce.fileoutputcommitter.algorithm.version", v)
            .partitionBy("bucket")
            .mode("overwrite")
            .parquet(out)
        )
        walls[c].append(round(time.perf_counter() - t0, 3))
        files[c] = len(glob.glob(os.path.join(out, "bucket=*", "*.parquet")))
        shutil.rmtree(out, ignore_errors=True)

    for c in combos:
        one(c, "w")
        walls[c].clear()
    for r in range(reps):
        for c in combos:
            one(c, r)
    spark.sparkContext.setJobDescription(None)
    for c in combos:
        w = sorted(walls[c])
        print(
            f"v{c[0]}-{c[1]:9s} best={w[0]:.3f} med={w[len(w) // 2]:.3f} "
            f"files={files[c]} walls={walls[c]}"
        )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
