#!/usr/bin/env python
"""Decompose the CDC merge's per-batch cost (r15, guide §1): time the
256-file scan, the resolve agg, the localCheckpoint, and the
256-file clustered write separately over the same store the A/B script
builds, so the optimization target is the measured phase, not a guess.
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("r15-cdc-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="sg_r15_decomp_")
    store = os.path.join(base, "store")
    keep_newest(synth(spark, 0)).repartitionByRange(
        N_OUT, F.col("device_id")
    ).write.partitionBy("bucket").mode("overwrite").parquet(store)

    ckpt = keep_newest(
        spark.read.parquet(store).unionByName(synth(spark, 1))
    ).localCheckpoint()
    ckpt.count()

    def t(label, fn):
        walls = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"r15-decomp:{label}")
            t0 = time.perf_counter()
            fn(r)
            walls.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{label:28s} best={min(walls):.3f} walls={walls}")

    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731

    t("scan256_noop", lambda r: noop(spark.read.parquet(store)))
    t(
        "scan256_union_batch_noop",
        lambda r: noop(spark.read.parquet(store).unionByName(synth(spark, 1))),
    )
    t(
        "resolve_noop",
        lambda r: noop(
            keep_newest(spark.read.parquet(store).unionByName(synth(spark, 1)))
        ),
    )
    t(
        "resolve_ckpt",
        lambda r: keep_newest(
            spark.read.parquet(store).unionByName(synth(spark, 1))
        )
        .localCheckpoint()
        .unpersist(),
    )

    def w_clustered(r):
        out = os.path.join(base, f"wout_{r}")
        ckpt.repartitionByRange(N_OUT, F.col("device_id")).write.partitionBy(
            "bucket"
        ).mode("overwrite").parquet(out)
        shutil.rmtree(out, ignore_errors=True)

    def w_flat4(r):
        out = os.path.join(base, f"wflat_{r}")
        ckpt.repartitionByRange(N_OUT, F.col("device_id")).write.mode(
            "overwrite"
        ).parquet(out)
        shutil.rmtree(out, ignore_errors=True)

    def w_range_nosample(r):
        # range exchange replaced by a driver-known split on key
        # quartiles (no sampling job): how much is the sampling worth?
        out = os.path.join(base, f"wq_{r}")
        ckpt.withColumn(
            "__f__", F.floor(F.col("device_id") / (16_345 / N_OUT)).cast("int")
        ).repartition(N_OUT, F.col("__f__")).drop("__f__").write.partitionBy(
            "bucket"
        ).mode("overwrite").parquet(out)
        shutil.rmtree(out, ignore_errors=True)

    t("write_256files_4tasks", w_clustered)
    t("write_4files_4tasks", w_flat4)
    t("write_256files_nosample", w_range_nosample)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
