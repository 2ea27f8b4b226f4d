#!/usr/bin/env python
"""A/B the CDC merge's resolve+stage pipeline variants (r15, guide §1).

Builds a REAL 256-file clustered store (the filestats layout: 64
buckets x 4 key-range files) from sf0.1-shaped synthetic CDC rows,
then times, interleaved, variants of the per-batch resolve+stage
pipeline over (store ∪ batch):

  A today      resolve -> localCheckpoint -> repartitionByRange(4,key)
               -> write partitionBy(bucket)
  B nockpt     same, without the localCheckpoint (range sampling
               re-executes the resolve subtree)
  C rangefirst repartitionByRange(4,key) BEFORE resolve (one shuffle,
               complete agg in 4 tasks; sampling re-runs the scan only)
  D wide       today's shape but repartitionByRange(256, bucket, key)
               (write parallelism 4 -> 256 tasks; file count per bucket
               becomes approximate)

Prints per-variant best/median wall and the produced file count, so
the layout impact is visible next to the timing.
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

N_KEYS = 16_345
N_ROWS = 100_000
N_BUCKETS = 64
N_OUT = 4


def synth(spark, seed_shift: int):
    return (
        spark.range(N_ROWS)
        .select(
            (F.pmod(F.xxhash64(F.col("id") + F.lit(seed_shift)), F.lit(N_KEYS)))
            .alias("device_id"),
            F.timestamp_millis(
                F.lit(1_600_000_000_000) + F.col("id") * 7 + seed_shift
            ).alias("ts"),
            (F.col("id") * 10 + seed_shift).alias("event_id"),
            (F.col("id") % 1000 / 7.0).alias("value"),
        )
        .withColumn(
            "bucket", F.pmod("device_id", F.lit(N_BUCKETS)).cast("int")
        )
    )


def keep_newest(df):
    others = [c for c in df.columns if c != "device_id"]
    kept = df.groupBy("device_id").agg(
        F.max_by(
            F.struct(*[F.col(c) for c in others]),
            F.struct(F.col("ts"), F.col("event_id")),
        ).alias("__kept__")
    )
    return kept.select(
        "device_id", *[F.col(f"__kept__.{c}").alias(c) for c in others]
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("r15-cdc-stage-ab")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="sg_r15_stage_ab_")
    store = os.path.join(base, "store")
    # Build the 256-file clustered store once (the real layout).
    keep_newest(synth(spark, 0)).repartitionByRange(
        N_OUT, F.col("device_id")
    ).write.partitionBy("bucket").mode("overwrite").parquet(store)
    n_store_files = len(glob.glob(os.path.join(store, "bucket=*", "*.parquet")))

    def merged_in():
        old = spark.read.parquet(store)
        return old.unionByName(synth(spark, 1))

    def v_today(out):
        merged = keep_newest(merged_in()).localCheckpoint()
        merged.repartitionByRange(N_OUT, F.col("device_id")).write.partitionBy(
            "bucket"
        ).mode("overwrite").parquet(out)
        merged.unpersist()

    def v_nockpt(out):
        keep_newest(merged_in()).repartitionByRange(
            N_OUT, F.col("device_id")
        ).write.partitionBy("bucket").mode("overwrite").parquet(out)

    def v_rangefirst(out):
        keep_newest(
            merged_in().repartitionByRange(N_OUT, F.col("device_id"))
        ).write.partitionBy("bucket").mode("overwrite").parquet(out)

    def v_wide(out):
        merged = keep_newest(merged_in()).localCheckpoint()
        merged.repartitionByRange(
            256, F.col("bucket"), F.col("device_id")
        ).write.partitionBy("bucket").mode("overwrite").parquet(out)
        merged.unpersist()

    variants = [
        ("A_today", v_today),
        ("B_nockpt", v_nockpt),
        ("C_rangefirst", v_rangefirst),
        ("D_wide", v_wide),
    ]

    # Warmup each once.
    for name, fn in variants:
        fn(os.path.join(base, f"warm_{name}"))

    walls: dict[str, list[float]] = {n: [] for n, _ in variants}
    files: dict[str, int] = {}
    for r in range(reps):
        for name, fn in variants:
            out = os.path.join(base, f"out_{name}_{r}")
            spark.sparkContext.setJobDescription(f"r15-stage:{name}")
            t0 = time.perf_counter()
            fn(out)
            walls[name].append(round(time.perf_counter() - t0, 3))
            files[name] = len(
                glob.glob(os.path.join(out, "bucket=*", "*.parquet"))
            )
            shutil.rmtree(out, ignore_errors=True)
    spark.sparkContext.setJobDescription(None)

    print(f"store files: {n_store_files}")
    for name, _ in variants:
        w = sorted(walls[name])
        med = w[len(w) // 2]
        print(
            f"{name:13s} best={w[0]:.3f} med={med:.3f} walls={walls[name]}"
            f" out_files={files[name]}"
        )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
