#!/usr/bin/env python
"""Concurrent signature-store write stress (r9 verdict item 3).

Exercises ``write_bucketed_table_atomic`` under the conditions that
produced the one-time transient FileAlreadyExistsException in the r9
qps mix, but harder: TWO Spark sessions (newSession — shared context,
separate SQL confs, the closest local mode gets to two clients) × 8
writer threads × ≥500 total writes against ONE store root, with a
deliberately hostile twist the qps mix never had — a quarter of the
writes target the SAME hot delta path concurrently, forcing the
publish loop's rename-aside/rename-in race to actually fire.

Pass = 0 errors, per-batch deltas read back exactly, the hot path
holds one complete copy (last-writer-wins), and no __stage__/__old__
dirs survive.

Usage: python scripts/store_stress.py [total_writes]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    from pyspark.sql import SparkSession, functions as F

    from sp500_stock_etl_spark.io.writers import write_bucketed_table_atomic

    spark = (
        SparkSession.builder.appName("store-stress")
        .master("local[16]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sessions = [spark, spark.newSession()]

    df = (
        spark.range(0, 2000)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") * 7 % 64).alias("band_key"),
        )
        .cache()
    )
    expected_rows = df.count()

    store_root = tempfile.mkdtemp(prefix="sg_store_stress_")
    errors: list[str] = []
    done = [0]
    lock = threading.Lock()

    def writer(tid: int, n_writes: int) -> None:
        sess = sessions[tid % 2]
        local_df = sess.range(0, 2000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") * 7 % 64).alias("band_key"),
        )
        for j in range(n_writes):
            # Every 4th write hammers one shared hot path — the
            # publish-race case; the rest are per-batch (the qps-mix
            # shape, unique path per invocation).
            hot = j % 4 == 0
            path = (
                f"{store_root}/delta_hot"
                if hot
                else f"{store_root}/delta_t{tid}_b{j}"
            )
            table = f"b_sstress_t{tid}_b{j}"
            try:
                write_bucketed_table_atomic(
                    local_df, table, "band_key", 4, path=path
                )
            except Exception as e:  # noqa: BLE001 — the metric IS errors
                with lock:
                    errors.append(f"t{tid} b{j} {type(e).__name__}: {e}")
            with lock:
                done[0] += 1
                if done[0] % 50 == 0:
                    print(f"PROG {done[0]} writes", flush=True)

    per_thread = (total + 7) // 8
    t0 = time.time()
    threads = [
        threading.Thread(target=writer, args=(i, per_thread)) for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    # Verification: per-batch deltas exact; hot path one complete copy.
    bad = []
    n_checked = 0
    for name in sorted(os.listdir(store_root)):
        if "__stage__" in name or "__old__" in name:
            bad.append(f"leftover dir {name}")
            continue
        n = spark.read.parquet(f"{store_root}/{name}").count()
        n_checked += 1
        if n != expected_rows:
            bad.append(f"{name}: {n} rows != {expected_rows}")

    print(
        f"STRESS writes={done[0]} wall={wall:.1f}s "
        f"({done[0] / wall:.1f} w/s) errors={len(errors)} "
        f"dirs_verified={n_checked} bad={len(bad)}",
        flush=True,
    )
    for e in errors[:10]:
        print("ERR", e)
    for b in bad[:10]:
        print("BAD", b)
    shutil.rmtree(store_root, ignore_errors=True)
    sys.exit(1 if errors or bad else 0)


if __name__ == "__main__":
    main()
