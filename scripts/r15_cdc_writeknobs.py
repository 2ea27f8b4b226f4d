#!/usr/bin/env python
"""Which knob owns the ~23 ms-per-file creation cost of the CDC
store's 256-file clustered write? (r15, guide §1/§6). Times the same
checkpointed 16k-row frame written as 256 files under combinations of
parquet codec / concurrent-output-writers / committer algorithm.
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("r15-cdc-writeknobs")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="sg_r15_kn_")
    store = os.path.join(base, "store")
    keep_newest(synth(spark, 0)).repartitionByRange(
        N_OUT, F.col("device_id")
    ).write.partitionBy("bucket").mode("overwrite").parquet(store)
    ckpt = keep_newest(
        spark.read.parquet(store).unionByName(synth(spark, 1))
    ).localCheckpoint()
    ckpt.count()

    combos = [
        ("baseline(snappy)", {}),
        ("codec=uncompressed", {"spark.sql.parquet.compression.codec": "uncompressed"}),
        ("codec=zstd", {"spark.sql.parquet.compression.codec": "zstd"}),
        ("concurrentWriters=68", {"spark.sql.maxConcurrentOutputFileWriters": "68"}),
        ("committer=v2", {"spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2"}),
        ("no-summary+v2", {
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
            "spark.hadoop.parquet.summary.metadata.level": "NONE",
        }),
    ]

    # warmup
    out = os.path.join(base, "warm")
    ckpt.repartitionByRange(N_OUT, F.col("device_id")).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(out)
    shutil.rmtree(out, ignore_errors=True)

    for label, conf in combos:
        olds = {}
        for k, v in conf.items():
            try:
                olds[k] = spark.conf.get(k)
            except Exception:
                olds[k] = None
            spark.conf.set(k, v)
        walls = []
        for r in range(reps):
            out = os.path.join(base, f"o_{r}")
            spark.sparkContext.setJobDescription(f"r15-kn:{label}")
            t0 = time.perf_counter()
            ckpt.repartitionByRange(N_OUT, F.col("device_id")).write.partitionBy(
                "bucket"
            ).mode("overwrite").parquet(out)
            walls.append(round(time.perf_counter() - t0, 3))
            shutil.rmtree(out, ignore_errors=True)
        for k, v in olds.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        print(f"{label:24s} best={min(walls):.3f} walls={walls}")
    spark.sparkContext.setJobDescription(None)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
