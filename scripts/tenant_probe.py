"""Per-tenant range clustering probe (r11 starter item): when hot
keys cluster per TENANT, does making the store's range key the
COMPOSITE (tenant, key) — realized as one long, tenant*2^40 + k —
restore file-level pruning that a global per-tenant key cannot give?

Background: the r11 sparse probe's negative result showed that when
every replica/tenant's keys span the same global range, range files
cluster by the bare key and every tenant appears in every file — a
batch updating ONE tenant touches ALL files (zero pruning). The fix
needs no engine change (`merge_manifest_store` takes key_col
generically): derive the composite upstream and cluster/bucket on it.

Two layouts over IDENTICAL logical data — T tenants x K keys each,
row identity (tenant, k), resolve keys on the composite either way:

- ``global_key``: key_col = k, bucket = k % N_BUCKETS. Every file
  holds every tenant; a hot-tenant batch intersects every file.
- ``composite``:  key_col = ck = tenant*2^40 + k,
  bucket = tenant % N_BUCKETS. Files cluster tenant-first; a
  hot-tenant batch touches that tenant's buckets and, within them,
  only the files whose ck range it hits.

Batch shape (the starter's scenario): HOT_TENANTS tenants, keys
strided across each tenant's whole range — worst case for the bare
key (spans the global k range) and the realistic case for the
composite.

Correctness: at the small T*K a full symmetric exceptAll between the
two layouts' final stores (on tenant, k, ver) must be zero; at every
size row counts and updated-row counts must match expectation.

Usage: python scripts/tenant_probe.py [n_keys_per_tenant ...]
(default: 20000 200000 -> 1.28M and 12.8M rows at 64 tenants)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TENANTS = 64
N_BUCKETS = 16
FILES_PER_BUCKET = 16
HOT_TENANTS = 2
BATCH_KEYS_PER_TENANT = 10_000


def _session() -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.appName("tenant-probe")
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

    w = W.partitionBy("ck").orderBy(F.col("ver").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )


def _with_layout(df, layout: str):
    if layout == "composite":
        return df.withColumn(
            "bucket", (F.col("tenant") % N_BUCKETS).cast("int")
        )
    return df.withColumn("bucket", (F.col("k") % N_BUCKETS).cast("int"))


def _base(spark, k_per_tenant: int, layout: str):
    rows = spark.range(N_TENANTS * k_per_tenant).selectExpr(
        f"id DIV {k_per_tenant} AS tenant",
        f"id % {k_per_tenant} AS k",
        "CAST(0 AS INT) AS ver",
    )
    return _with_layout(
        rows.withColumn(
            "ck", F.col("tenant") * F.lit(1 << 40) + F.col("k")
        ),
        layout,
    )


def _batch(spark, k_per_tenant: int, layout: str):
    stride = max(k_per_tenant // BATCH_KEYS_PER_TENANT, 1)
    n = min(BATCH_KEYS_PER_TENANT, k_per_tenant)
    rows = spark.range(HOT_TENANTS * n).selectExpr(
        f"id DIV {n} AS tenant",
        f"(id % {n}) * {stride} AS k",
        "CAST(1 AS INT) AS ver",
    )
    return _with_layout(
        rows.withColumn(
            "ck", F.col("tenant") * F.lit(1 << 40) + F.col("k")
        ),
        layout,
    )


def main() -> None:
    from sp500_stock_etl_spark.io.manifest_store import (
        merge_manifest_store,
        read_store,
    )

    ks = [int(a) for a in sys.argv[1:]] or [20_000, 200_000]
    spark = _session()

    for k_per_tenant in ks:
        finals = {}
        roots = {}
        for layout in ("global_key", "composite"):
            key_col = "ck" if layout == "composite" else "k"
            root = tempfile.mkdtemp(prefix="sg_tprobe_")
            roots[layout] = root
            store = f"{root}/store"
            t0 = time.perf_counter()
            merge_manifest_store(
                store,
                _base(spark, k_per_tenant, layout),
                key_col,
                "bucket",
                _keep_newest,
                files_per_bucket=FILES_PER_BUCKET,
            )
            build_s = round(time.perf_counter() - t0, 2)

            batch = _batch(spark, k_per_tenant, layout)
            n_batch = batch.count()
            t0 = time.perf_counter()
            stats = merge_manifest_store(
                store,
                batch,
                key_col,
                "bucket",
                _keep_newest,
                files_per_bucket=FILES_PER_BUCKET,
            )
            merge_s = round(time.perf_counter() - t0, 2)

            final = read_store(spark, store)
            n_rows = final.count()
            n_v1 = final.where("ver = 1").count()
            finals[layout] = final.select("tenant", "k", "ver")

            # Read side of the same property: a one-tenant scan. On
            # the composite layout the manifest hands Spark only that
            # tenant's files; on the bare-key layout the tenant's ck
            # range spans every file's key range, so nothing prunes.
            t0 = time.perf_counter()
            if layout == "composite":
                one = read_store(
                    spark, store,
                    key_range=(3 << 40, (3 << 40) + k_per_tenant),
                )
            else:
                one = read_store(spark, store).where("tenant = 3")
            n_one = one.count()
            scan_s = round(time.perf_counter() - t0, 2)
            scan_files = len(one.inputFiles())
            print(
                json.dumps(
                    {
                        "rows": N_TENANTS * k_per_tenant,
                        "layout": layout,
                        "build_s": build_s,
                        "merge_s": merge_s,
                        "files_read": stats["files_read"],
                        "files_total": stats["files_total"],
                        "bytes_read": stats["bytes_read"],
                        "bytes_total": stats["bytes_total"],
                        "read_frac": round(
                            stats["bytes_read"]
                            / max(stats["bytes_total"], 1),
                            4,
                        ),
                        "pruning": stats["pruning"],
                        "rows_ok": n_rows == N_TENANTS * k_per_tenant,
                        "updated_ok": n_v1 == n_batch,
                        "one_tenant_scan_s": scan_s,
                        "one_tenant_files": scan_files,
                        "one_tenant_rows_ok": n_one == k_per_tenant,
                    }
                ),
                flush=True,
            )

        if N_TENANTS * k_per_tenant <= 2_000_000:
            a, b = finals["global_key"], finals["composite"]
            diff = a.exceptAll(b).count() + b.exceptAll(a).count()
            print(json.dumps({"rows": N_TENANTS * k_per_tenant,
                              "layouts_bit_equal": diff == 0}), flush=True)
        for root in roots.values():
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
