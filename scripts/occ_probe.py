"""Optimistic-concurrency probe for the manifest store: N writer
threads merging CONCURRENTLY into one store at millions of keys.

Two phases per store size:

- ``disjoint``: R rounds of W writers, each updating a stride of keys
  inside its own quarter of the key space. Key ranges are disjoint but
  range-clustered files are shared, so commits conflict and redo —
  the probe records the redo distribution and per-round wall. Every
  update must land exactly once (per-quarter version check) and the
  generation must advance once per committed merge.
- ``overlap``: W writers update the SAME key set with distinct
  versions; serialization through redo must leave every key at the
  MAX version regardless of commit order (each redo resolves over the
  winner's output).

Writers run with retention_seconds=3600 so a redo loser's input files
are never GC'd mid-read (the documented operating rule for concurrent
writers).

Usage: python scripts/occ_probe.py [n_keys ...]   (default: 4000000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BUCKETS = 64
FILES_PER_BUCKET = 16
N_WRITERS = int(os.environ.get("SPARK_GRAFT_OCC_WRITERS", "4"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_OCC_ROUNDS", "3"))
BATCH_KEYS = 100_000
RETENTION = 3600.0
# 0 = flat manifest (default); K = create the store with a K-way
# SHARDED manifest, so the whole OCC scenario set also exercises the
# sharded commit path (touched-shard rewrite under redo).
MANIFEST_SHARDS = int(os.environ.get("SPARK_GRAFT_MANIFEST_SHARDS", "0"))


def _session() -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.appName("occ-probe")
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


def _base(spark, n):
    return spark.range(n).selectExpr(
        "id AS k",
        "CAST(0 AS INT) AS ver",
        f"CAST(id % {N_BUCKETS} AS INT) AS bucket",
    )


def _writer_batch(spark, n, writer, ver):
    quarter = n // N_WRITERS
    lo = writer * quarter
    stride = max(quarter // BATCH_KEYS, 1)
    m = min(BATCH_KEYS, quarter)
    return spark.range(m).selectExpr(
        f"id * {stride} + {lo} AS k",
        f"CAST({ver} AS INT) AS ver",
        f"CAST((id * {stride} + {lo}) % {N_BUCKETS} AS INT) AS bucket",
    )


def _overlap_batch(spark, n, ver):
    stride = max(n // BATCH_KEYS, 1)
    m = min(BATCH_KEYS, n)
    return spark.range(m).selectExpr(
        f"id * {stride} AS k",
        f"CAST({ver} AS INT) AS ver",
        f"CAST((id * {stride}) % {N_BUCKETS} AS INT) AS bucket",
    )


def main() -> None:
    from sp500_stock_etl_spark.hostinfo import host_stamp
    from sp500_stock_etl_spark.io.manifest_store import (
        merge_manifest_store,
        read_manifest,
        read_store,
    )

    stamp = host_stamp()
    backend = os.environ.get("SPARK_GRAFT_LOCK_BACKEND", "posix")
    ns = [int(a) for a in sys.argv[1:]] or [4_000_000]
    spark = _session()

    for n in ns:
        root = tempfile.mkdtemp(prefix="sg_occprobe_")
        store = f"{root}/store"
        merge_manifest_store(
            store,
            _base(spark, n),
            "k",
            "bucket",
            _keep_newest,
            files_per_bucket=FILES_PER_BUCKET,
            manifest_shards=MANIFEST_SHARDS or None,
        )

        retries: list[int] = []
        errors: list[str] = []

        def run_writer(writer: int, ver: int, batch) -> None:
            try:
                st = merge_manifest_store(
                    store,
                    batch,
                    "k",
                    "bucket",
                    _keep_newest,
                    files_per_bucket=FILES_PER_BUCKET,
                    retention_seconds=RETENTION,
                )
                retries.append(st["commit_retries"])
            except Exception as e:
                errors.append(f"w{writer}v{ver}: {e!r}")

        t0 = time.perf_counter()
        for rnd in range(1, ROUNDS + 1):
            threads = [
                threading.Thread(
                    target=run_writer,
                    args=(w, rnd, _writer_batch(spark, n, w, rnd)),
                )
                for w in range(N_WRITERS)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        disjoint_s = round(time.perf_counter() - t0, 2)

        final = read_store(spark, store)
        quarter = n // N_WRITERS
        stride = max(quarter // BATCH_KEYS, 1)
        per_quarter_ok = all(
            [
                r[0]
                for r in final.where(
                    f"k >= {w * quarter} AND k < {(w + 1) * quarter} "
                    f"AND (k - {w * quarter}) % {stride} = 0 "
                    f"AND (k - {w * quarter}) / {stride} < {BATCH_KEYS}"
                )
                .select("ver")
                .distinct()
                .collect()
            ]
            == [ROUNDS]
            for w in range(N_WRITERS)
        )
        gen = read_manifest(store)["generation"]
        print(
            json.dumps(
                {
                    "n_keys": n,
                    "phase": "disjoint",
                    "lock_backend": backend,
                    "manifest_shards": MANIFEST_SHARDS,
                    **stamp,
                    "writers": N_WRITERS,
                    "rounds": ROUNDS,
                    "wall_s": disjoint_s,
                    "commit_retries": sorted(retries),
                    "errors": errors,
                    "rows_ok": final.count() == n,
                    "distinct_ok": final.select("k").distinct().count() == n,
                    "versions_ok": per_quarter_ok,
                    "generation_ok": gen == N_WRITERS * ROUNDS,
                }
            ),
            flush=True,
        )

        retries.clear()
        errors.clear()
        t0 = time.perf_counter()
        threads = [
            threading.Thread(
                target=run_writer,
                args=(w, 100 + w, _overlap_batch(spark, n, 100 + w)),
            )
            for w in range(N_WRITERS)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        overlap_s = round(time.perf_counter() - t0, 2)

        final = read_store(spark, store)
        stride = max(n // BATCH_KEYS, 1)
        touched = final.where(
            f"k % {stride} = 0 AND k / {stride} < {BATCH_KEYS}"
        )
        max_ver = 100 + N_WRITERS - 1
        vers = [r[0] for r in touched.select("ver").distinct().collect()]
        print(
            json.dumps(
                {
                    "n_keys": n,
                    "phase": "overlap",
                    "lock_backend": backend,
                    "manifest_shards": MANIFEST_SHARDS,
                    **stamp,
                    "writers": N_WRITERS,
                    "wall_s": overlap_s,
                    "commit_retries": sorted(retries),
                    "errors": errors,
                    "rows_ok": final.count() == n,
                    "max_ver_wins": vers == [max_ver],
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
