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

r14 (r13 verdict item 5) adds a third, COMPOSED phase on the same
stores: the maintenance tick. The growth phase deliberately leaves
every bucket ~`n_growth x FILES_PER_BUCKET` tiny live files — a
realistic binpack backlog. Phase 3 streams narrow CDC merges (key-band
restricted, so merges prune their reads and do NOT themselves binpack
the touched buckets) into BOTH twins while, on the advisor-picked
sharded store only, a background thread loops ``compaction_candidates
-> compact_manifest_store(buckets=...)`` under ordinary OCC — merge
traffic + nightly binpack + advisor all in ONE probe on the ~100k-file
store. Reported: per-store merge commit medians during the maintained
segment, the live-file ceiling vs final count (the maintenance
dividend), compaction tick stats (buckets, files rewritten, retries),
and the same restricted-slice content parity at the very end (now
covering the post-maintenance state).

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
import threading
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


def _phase3_batch(spark, seed: int, total_keys: int):
    """Narrow steady-state CDC merge for the maintained segment: the
    same 10-bucket window as ``_sparse_batch`` but keys restricted to
    a rotating 1/64 key band, so the merge's key-range pruning reads
    only the handful of files overlapping the band and its outputs do
    NOT binpack the touched buckets — the growth backlog stays for the
    maintenance tick to reclaim, as in production where CDC updates
    are narrow and binpacking is the nightly job's work."""
    start = (seed * 13) % (N_BUCKETS - 10)
    band = total_keys // 64
    lo = (seed * 31 % 64) * band
    exprs = ",".join(str(b) for b in range(start, start + 10))
    return (
        spark.range(lo, lo + band)
        .selectExpr(
            "id AS k",
            f"CAST({2000 + seed} AS INT) AS ver",
            f"CAST(id % {N_BUCKETS} AS INT) AS bucket",
        )
        .where(f"bucket IN ({exprs}) AND (id % 7) = 0")
    )


N_MAINT_MERGES = 32
MAINT_MAX_BUCKETS = 16  # buckets binpacked per maintenance tick


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

            # --- Phase 3 (r13 verdict item 5): maintained steady
            # state. Narrow CDC merges stream into the store while,
            # on the sharded twin only, a background maintenance
            # thread loops compaction_candidates -> partial
            # compaction under ordinary OCC (one tail tick after the
            # merges finish, maintenance_probe's shape). The flat
            # twin receives the identical merge schedule with no
            # maintenance — its ceiling is the unmaintained contrast.
            maint_events: list[dict] = []
            maint_errors: list[str] = []
            writers_done = threading.Event()

            def run_maintenance(store=store) -> None:
                tail_done = False
                while not (tail_done and writers_done.is_set()):
                    tail_done = writers_done.is_set()
                    try:
                        cands = MS.compaction_candidates(
                            store,
                            files_per_bucket=FILES_PER_BUCKET,
                            max_buckets=MAINT_MAX_BUCKETS,
                        )
                        if not cands:
                            time.sleep(0.2)
                            continue
                        cst = MS.compact_manifest_store(
                            spark,
                            store,
                            "k",
                            "bucket",
                            files_per_bucket=FILES_PER_BUCKET,
                            retention_seconds=3600.0,
                            buckets=set(cands),
                        )
                        maint_events.append(
                            {
                                "n_buckets": len(cst["buckets"]),
                                "files_before": cst["files_before"],
                                "files_after": cst["files_after"],
                                "retries": cst["commit_retries"],
                            }
                        )
                    except Exception as e:  # pragma: no cover
                        maint_errors.append(repr(e))
                        return

            maint_thread = None
            if label != "flat":
                maint_thread = threading.Thread(target=run_maintenance)
                maint_thread.start()
            p3: list[dict] = []
            t3 = time.perf_counter()
            for seed in range(N_MAINT_MERGES):
                st = MS.merge_manifest_store(
                    store,
                    _phase3_batch(spark, seed, total_keys),
                    "k",
                    "bucket",
                    _keep_newest,
                    files_per_bucket=FILES_PER_BUCKET,
                    retention_seconds=3600.0,
                )
                p3.append(
                    {
                        "commit_s": st.get("phases", {}).get("commit_s"),
                        "wall_s": st["wall_s"],
                        "files_read": st["files_read"],
                        "files_total": st["files_total"],
                        "retries": st["commit_retries"],
                    }
                )
            writers_done.set()
            if maint_thread is not None:
                maint_thread.join()
            m_final = MS.read_manifest(store)
            commits3 = sorted(
                s["commit_s"] for s in p3 if s["commit_s"] is not None
            )
            steady = {
                "merges": len(p3),
                "merge_commit_s_median": commits3[len(commits3) // 2],
                "merge_wall_s_median": sorted(s["wall_s"] for s in p3)[
                    len(p3) // 2
                ],
                "merge_retries": sorted(s["retries"] for s in p3),
                "files_total_ceiling": max(s["files_total"] for s in p3),
                "live_files_final": MS._files_total(m_final),
                "generation": m_final["generation"],
                "wall_s": round(time.perf_counter() - t3, 1),
            }
            if label != "flat":
                steady["compaction"] = {
                    "ticks": len(maint_events),
                    "buckets": sum(e["n_buckets"] for e in maint_events),
                    "files_rewritten": sum(
                        e["files_before"] for e in maint_events
                    ),
                    "files_after": sum(
                        e["files_after"] for e in maint_events
                    ),
                    "retries": sorted(
                        e["retries"] for e in maint_events
                    ),
                    "errors": maint_errors,
                }
                assert not maint_errors, maint_errors
            results[label]["maintained_steady"] = steady
            print(
                json.dumps(
                    {"store": label, "maintained_steady": steady}
                ),
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
        shard_label = f"sharded_k{k_advised}"
        shard_med = results[shard_label]["sparse_commit_s_median"]
        flat_steady = results["flat"]["maintained_steady"]
        shard_steady = results[shard_label]["maintained_steady"]
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
                        "maintained_steady": {
                            "flat_unmaintained_final_files": flat_steady[
                                "live_files_final"
                            ],
                            "sharded_maintained_final_files": shard_steady[
                                "live_files_final"
                            ],
                            "sharded_ceiling": shard_steady[
                                "files_total_ceiling"
                            ],
                            "flat_merge_commit_s_median": flat_steady[
                                "merge_commit_s_median"
                            ],
                            "sharded_merge_commit_s_median": shard_steady[
                                "merge_commit_s_median"
                            ],
                            "compaction": shard_steady["compaction"],
                        },
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
