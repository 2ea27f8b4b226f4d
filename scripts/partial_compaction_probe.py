"""Partial (bucket-scoped) vs FULL compaction at scale (r13).

Merge growth concentrates where the writes are: each narrow merge
leaves up to files_per_bucket new files in its touched buckets whose
key ranges overlap the old ones. Full compaction repairs that by
rewriting the ENTIRE live set — a non-starter as routine maintenance
at the 100 TB / 200k-file point. Partial compaction
(``compact_manifest_store(buckets=...)``, targets picked by
``compaction_candidates``) rewrites only the inflated buckets, and
COMMUTES with concurrent merges in other buckets (validation scope =
target buckets; pinned in tests/test_manifest_store.py).

This probe builds one store (1024 buckets), inflates a 10-bucket hot
set with 3 narrow merges each, clones the store directory, then runs
partial compaction (advisor-picked candidates) on one clone and full
compaction on the other. Reported per path: wall, files rewritten,
files read, and post-repair pruning effectiveness (files_read of an
identical narrow probe merge); content parity asserted between the
two clones at the end.

Usage: python scripts/partial_compaction_probe.py [n_keys]
(default 1_048_576 → 4096-file base at files_per_bucket=4)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BUCKETS = 1024
FPB = 4
HOT = list(range(0, 100, 10))  # 10 hot buckets


def _keep_newest(df):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("k").orderBy(F.col("ver").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )


def _narrow_batch(spark, bucket: int, ver: int, n_keys: int, n: int = 64):
    """n keys of one bucket inside a ver-specific narrow band."""
    base = (ver * 7919 * N_BUCKETS) % n_keys
    return spark.range(n).selectExpr(
        f"({base} + id * {N_BUCKETS} + {bucket}) % {n_keys} AS k",
        f"CAST({ver} AS INT) AS ver",
        f"CAST(({base} + id * {N_BUCKETS} + {bucket}) % {n_keys} "
        f"% {N_BUCKETS} AS INT) AS bucket",
    )


def main() -> None:
    from pyspark.sql import SparkSession

    from sp500_stock_etl_spark.hostinfo import host_stamp
    from sp500_stock_etl_spark.io import manifest_store as MS

    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("partial-compaction-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="sg_partial_compact_")
    base_store = os.path.join(root, "base")
    try:
        MS.merge_manifest_store(
            base_store,
            spark.range(n_keys).selectExpr(
                "id AS k",
                "CAST(0 AS INT) AS ver",
                f"CAST(id % {N_BUCKETS} AS INT) AS bucket",
            ),
            "k",
            "bucket",
            _keep_newest,
            files_per_bucket=FPB,
            retention_seconds=3600.0,
        )
        for b in HOT:
            for ver in (1, 2, 3):
                MS.merge_manifest_store(
                    base_store,
                    _narrow_batch(spark, b, ver, n_keys),
                    "k",
                    "bucket",
                    _keep_newest,
                    files_per_bucket=FPB,
                    retention_seconds=3600.0,
                )
        m = MS.read_manifest(base_store)
        files_grown = MS._files_total(m)
        cands = MS.compaction_candidates(base_store, files_per_bucket=FPB)
        print(
            json.dumps(
                {
                    "host": host_stamp(),
                    "n_keys": n_keys,
                    "files_after_growth": files_grown,
                    "candidates": cands,
                }
            ),
            flush=True,
        )

        stores = {}
        for mode in ("partial", "full"):
            d = os.path.join(root, mode)
            shutil.copytree(base_store, d)
            stores[mode] = d

        results = {}
        for mode, store in stores.items():
            t0 = time.perf_counter()
            if mode == "partial":
                st = MS.compact_manifest_store(
                    spark,
                    store,
                    "k",
                    "bucket",
                    files_per_bucket=FPB,
                    retention_seconds=3600.0,
                    buckets=set(cands),
                )
            else:
                st = MS.compact_manifest_store(
                    spark,
                    store,
                    "k",
                    "bucket",
                    files_per_bucket=FPB,
                    retention_seconds=3600.0,
                )
            wall = round(time.perf_counter() - t0, 3)
            # Post-repair pruning: an identical narrow probe merge into
            # the hottest bucket — files_read is the pruning measure.
            probe = MS.merge_manifest_store(
                store,
                _narrow_batch(spark, HOT[0], 5, n_keys),
                "k",
                "bucket",
                _keep_newest,
                files_per_bucket=FPB,
                retention_seconds=3600.0,
            )
            results[mode] = {
                "compact_wall_s": wall,
                "files_rewritten": st["files_before"],
                "files_written": st["files_after"],
                "files_total_after": probe["files_total"],
                "probe_merge_files_read": probe["files_read"],
                "probe_merge_wall_s": probe["wall_s"],
            }
            print(json.dumps({mode: results[mode]}), flush=True)

        # Content parity between the two repair paths (both clones got
        # the same probe merge afterwards).
        rows = {}
        for mode, store in stores.items():
            rows[mode] = (
                MS.read_store(spark, store)
                .selectExpr("sum(k) AS sk", "sum(ver) AS sv", "count(*) AS c")
                .first()
            )
        assert tuple(rows["partial"]) == tuple(rows["full"]), rows
        print(
            json.dumps(
                {
                    "verdict": {
                        "wall_ratio_partial_vs_full": round(
                            results["partial"]["compact_wall_s"]
                            / results["full"]["compact_wall_s"],
                            3,
                        ),
                        "rewrite_ratio": round(
                            results["partial"]["files_rewritten"]
                            / results["full"]["files_rewritten"],
                            3,
                        ),
                        "content_parity": True,
                        "host": host_stamp(),
                    }
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
