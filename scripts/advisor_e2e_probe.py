"""End-to-end validation of the manifest shard-count ADVISOR (r13;
r12 verdict item 5).

``tuning.advise_manifest_shards`` was calibrated from
``manifest_scale_probe.py``'s SYNTHETIC series (driver-side JSON
arithmetic over fabricated entries). This probe closes the loop with
a REAL store: two twins — flat, and sharded at the K the advisor
picks for the target live-file count — are each grown past 100k live
parquet files through genuine ``merge_manifest_store`` commits (real
Spark writes, real footer stats, real OCC commits), then hit with the
steady-state workload the advisor is for: sparse CDC merges updating
~1% of buckets. Recorded per commit: total ``wall_s`` and the
``phases`` breakdown (probe/resolve/stage/commit) — ``commit_s`` is
the metadata work under and around the lock, the quantity the advisor
trades against shard-count overhead.

What "confirmed" looks like (from the synthetic series): flat
~0.85-1.0 s/commit of metadata at ~100k entries, the advisor-picked
sharded store proportional to touched shards (~0.1-0.2 s), with
identical merge RESULTS (content parity asserted at the end on a
restricted key range).

Shape notes (honesty over convenience):
- growth is by append merges over disjoint key ranges — every bucket
  is touched, so the SHARDED store rewrites all its shards during
  growth (no cherry-picked advantage; its growth commits pay full
  freight);
- the measured phase updates keys that already exist, in a 1%-bucket
  slice — the CDC steady state (file selection + data rewrite only in
  touched buckets);
- the advisor is consulted ONCE, up front, with the expected
  steady-state file count — the deployment shape its docstring asks
  for.

Usage: python scripts/advisor_e2e_probe.py [target_files]
(default 102_400; ~12 min on the r12/r13 host, most of it Spark
writing ~205k tiny parquet files across the two stores)
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
FILES_PER_BUCKET = 4  # creation/growth n_out
ROWS_PER_BUCKET = 25  # tiny files: metadata scale, not data scale


def _keep_newest(df):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("k").orderBy(F.col("ver").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )


def _growth_batch(spark, gen: int, rows: int):
    """Disjoint key range per generation; bucket = k % N_BUCKETS, so
    every growth merge touches all buckets (appends, replaces none)."""
    base = gen * rows
    return spark.range(base, base + rows).selectExpr(
        "id AS k",
        f"CAST({gen} AS INT) AS ver",
        f"CAST(id % {N_BUCKETS} AS INT) AS bucket",
    )


def _sparse_batch(spark, seed: int, total_keys: int):
    """~1%-of-buckets update batch over EXISTING keys: buckets
    [start, start+10), 64 keys each — the steady-state CDC shape."""
    start = (seed * 13) % (N_BUCKETS - 10)
    picked = list(range(start, start + 10))
    exprs = ",".join(str(b) for b in picked)
    return (
        spark.range(total_keys)
        .selectExpr(
            "id AS k",
            f"CAST({1000 + seed} AS INT) AS ver",
            f"CAST(id % {N_BUCKETS} AS INT) AS bucket",
        )
        .where(f"bucket IN ({exprs}) AND (id % 7) = 0")
    )


def main() -> None:
    from pyspark.sql import SparkSession

    from sp500_stock_etl_spark.hostinfo import host_stamp
    from sp500_stock_etl_spark.io import manifest_store as MS
    from sp500_stock_etl_spark.tuning import advise_manifest_shards

    target_files = int(sys.argv[1]) if len(sys.argv) > 1 else 102_400
    files_per_merge = N_BUCKETS * FILES_PER_BUCKET
    n_growth = -(-target_files // files_per_merge)  # ceil
    rows_per_merge = N_BUCKETS * ROWS_PER_BUCKET
    total_keys = n_growth * rows_per_merge

    k_advised = advise_manifest_shards(target_files)
    print(
        json.dumps(
            {
                "host": host_stamp(),
                "target_files": target_files,
                "growth_merges": n_growth,
                "files_per_merge": files_per_merge,
                "advised_shards": k_advised,
            }
        ),
        flush=True,
    )
    assert k_advised, "advisor must shard past the flat comfort zone"

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        # The \r-driven console progress bar splices itself into
        # piped stdout lines (the r13 run lost its per-store detail
        # lines to it); this probe's output IS its product.
        .config("spark.ui.showConsoleProgress", "false")
        .appName("advisor-e2e-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="sg_advisor_e2e_")
    stores = {
        "flat": (os.path.join(root, "flat"), {}),
        f"sharded_k{k_advised}": (
            os.path.join(root, "sharded"),
            {"manifest_shards": k_advised},
        ),
    }
    results: dict[str, dict] = {}
    try:
        for label, (store, kw) in stores.items():
            growth_walls = []
            t_all = time.perf_counter()
            for g in range(n_growth):
                st = MS.merge_manifest_store(
                    store,
                    _growth_batch(spark, g, rows_per_merge),
                    "k",
                    "bucket",
                    _keep_newest,
                    files_per_bucket=FILES_PER_BUCKET,
                    retention_seconds=3600.0,
                    **(kw if g == 0 else {}),
                )
                growth_walls.append(st["wall_s"])
            files_total = st["files_total"]
            st_trim = {
                k: (f"<{len(v)} buckets>" if k == "touched_buckets" else v)
                for k, v in st.items()
            }
            print(
                json.dumps(
                    {
                        "store": label,
                        "phase": "growth",
                        "files_total": files_total,
                        "growth_wall_s": round(
                            time.perf_counter() - t_all, 1
                        ),
                        "last_growth_merge": st_trim,
                    }
                ),
                flush=True,
            )

            sparse = []
            for seed in range(10):
                st = MS.merge_manifest_store(
                    store,
                    _sparse_batch(spark, seed, total_keys),
                    "k",
                    "bucket",
                    _keep_newest,
                    files_per_bucket=FILES_PER_BUCKET,
                    retention_seconds=3600.0,
                )
                sparse.append(
                    {
                        "wall_s": st["wall_s"],
                        "phases": st.get("phases", {}),
                        "files_read": st["files_read"],
                        "files_total": st["files_total"],
                    }
                )
            commits = sorted(
                s["phases"].get("commit_s", 0.0) for s in sparse
            )
            results[label] = {
                "files_total": files_total,
                "sparse_commit_s_median": commits[len(commits) // 2],
                "sparse_commit_s": [
                    s["phases"].get("commit_s") for s in sparse
                ],
                "sparse_wall_s": [s["wall_s"] for s in sparse],
                "sparse_files_read": [s["files_read"] for s in sparse],
            }
            print(
                json.dumps({"store": label, "sparse": results[label]}),
                flush=True,
            )

        # Content parity on a restricted slice (full-store sort would
        # be the probe's own bottleneck; a 3-bucket slice through the
        # manifest path exercises shard resolution end-to-end).
        check_buckets = {0, 7, 501}
        rows = {}
        for label, (store, _) in stores.items():
            rows[label] = sorted(
                tuple(r)
                for r in MS.read_store(
                    spark, store, buckets=check_buckets
                )
                .select("k", "ver")
                .collect()
            )
        vals = list(rows.values())
        assert vals[0] == vals[1] and vals[0], "flat/sharded content parity"

        flat_med = results["flat"]["sparse_commit_s_median"]
        shard_med = results[f"sharded_k{k_advised}"][
            "sparse_commit_s_median"
        ]
        print(
            json.dumps(
                {
                    "verdict": {
                        "advised_shards": k_advised,
                        "flat_commit_s_median": flat_med,
                        "sharded_commit_s_median": shard_med,
                        "ratio": round(shard_med / flat_med, 3)
                        if flat_med
                        else None,
                        "content_parity_rows": len(vals[0]),
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
