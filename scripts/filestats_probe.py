"""File-level CDC merge probe (r10 verdict item 2): at a >=100M-key
store, does the merge's read-back track touched KEYS instead of
touched buckets?

For each batch shape the table reports BOTH granularities over the
same store state:

- ``bytes_read``      — what merge_touched_files actually read
                        (footer min/max file selection);
- ``bytes_bucket_lvl``— what the partition-level merge
                        (merge_touched_partitions) would have read:
                        every file of every touched bucket.

Batch shapes (100k keys each against the full key space):
- clustered:    one contiguous key range -> intersects ~1 of the
                files_per_bucket range files per bucket; read-back
                should be ~1/files_per_bucket of bucket-level;
- single_bucket: keys confined to bucket 0 -> bucket-level pruning
                already helps; file-level should prune further;
- scattered:    keys strided across the whole range -> every file
                intersects; read-back == bucket-level == whole store.
                The honesty row: file stats cannot prune a uniform
                batch, which is exactly why the registered uniform
                CDC query shows files_read ~= files_total.

Correctness: at the small n a full symmetric exceptAll against the
expected post-merge frame must be zero; at the big n the row count
and per-version aggregates must match expectation exactly.

Usage: python scripts/filestats_probe.py [n_keys ...]
(default: 1000000 100000000)
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BUCKETS = 64
FILES_PER_BUCKET = 16
BATCH_KEYS = 100_000


def _session() -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.appName("filestats-probe")
        .master(f"local[{cpus}]")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config("spark.sql.shuffle.partitions", str(cpus))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _keep_newest(df):
    from pyspark.sql import Window as W

    w = W.partitionBy("k").orderBy(F.col("ver").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )


def _base(spark, n_keys: int):
    return spark.range(n_keys).selectExpr(
        "id AS k",
        "CAST(0 AS INT) AS ver",
        f"CAST(id % {N_BUCKETS} AS INT) AS bucket",
    )


def _batch(spark, shape: str, n_keys: int):
    if shape == "clustered":
        ks = spark.range(BATCH_KEYS).selectExpr("id AS k")
    elif shape == "single_bucket":
        # Bucket 0 only AND range-narrow: one of its 16 range files.
        s = min(BATCH_KEYS, n_keys // N_BUCKETS // FILES_PER_BUCKET)
        ks = spark.range(s).selectExpr(f"id * {N_BUCKETS} AS k")
    elif shape == "scattered":
        stride = max(n_keys // BATCH_KEYS, 1)
        ks = spark.range(BATCH_KEYS).selectExpr(f"id * {stride} AS k")
    else:
        raise ValueError(shape)
    return ks.selectExpr(
        "k",
        "CAST(1 AS INT) AS ver",
        f"CAST(k % {N_BUCKETS} AS INT) AS bucket",
    )


def _bucket_level_bytes(store: str, touched: list) -> int:
    total = 0
    for b in touched:
        for p in glob.glob(os.path.join(store, f"bucket={b}", "*.parquet")):
            total += os.path.getsize(p)
    return total


def main() -> None:
    import shutil
    import tempfile

    from sp500_stock_etl_spark.io.writers import merge_touched_files

    ns = [int(a) for a in sys.argv[1:]] or [1_000_000, 100_000_000]
    spark = _session()

    for n_keys in ns:
        for shape in ("clustered", "single_bucket", "scattered"):
            root = tempfile.mkdtemp(prefix="sg_fsprobe_")
            store = f"{root}/store"
            t0 = time.perf_counter()
            merge_touched_files(
                store,
                _base(spark, n_keys),
                "k",
                "bucket",
                _keep_newest,
                files_per_bucket=FILES_PER_BUCKET,
            )
            build_s = round(time.perf_counter() - t0, 2)

            batch = _batch(spark, shape, n_keys)
            # Bucket-level comparator from the PRE-merge store state
            # (what merge_touched_partitions would read back).
            pre_touched = sorted(
                r[0] for r in batch.select("bucket").distinct().collect()
            )
            bucket_bytes = _bucket_level_bytes(store, pre_touched)
            t0 = time.perf_counter()
            stats = merge_touched_files(
                store,
                batch,
                "k",
                "bucket",
                _keep_newest,
                files_per_bucket=FILES_PER_BUCKET,
            )
            merge_s = round(time.perf_counter() - t0, 2)

            # Correctness: exact expected frame (batch keys ver=1,
            # everything else carried at ver=0; all batch shapes only
            # update existing keys, so the count must not move).
            n_batch = batch.count()
            final = spark.read.parquet(store)
            n_rows = final.count()
            n_v1 = final.where("ver = 1").count()
            checks = {
                "rows_ok": n_rows == n_keys,
                "updated_ok": n_v1 == n_batch,
                "distinct_ok": final.select("k").distinct().count()
                == n_keys,
            }
            if n_keys <= 2_000_000:
                expected = _base(spark, n_keys).join(
                    batch.select("k"), "k", "left_anti"
                ).unionByName(_batch(spark, shape, n_keys))
                diff = (
                    final.exceptAll(expected).count()
                    + expected.exceptAll(final).count()
                )
                checks["bit_equal"] = diff == 0

            print(
                json.dumps(
                    {
                        "n_keys": n_keys,
                        "shape": shape,
                        "build_s": build_s,
                        "merge_s": merge_s,
                        "files_read": stats["files_read"],
                        "files_total": stats["files_total"],
                        "bytes_read": stats["bytes_read"],
                        "bytes_bucket_lvl": bucket_bytes,
                        "bytes_total": stats["bytes_total"],
                        "read_vs_bucket_lvl": round(
                            stats["bytes_read"] / max(bucket_bytes, 1), 4
                        ),
                        **checks,
                    }
                ),
                flush=True,
            )
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
