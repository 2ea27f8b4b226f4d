"""Maintenance-under-traffic probe: partial compaction running as a
REAL background thread while concurrent writers merge into the same
store (r13).

The commutation property behind partial compaction was pinned with a
staged-interleave hook (tests/test_manifest_store.py) — deterministic,
but scheduled. This probe removes the scheduling: W writer threads
stream narrow merges into writer-owned hot buckets while a maintenance
thread loops ``compaction_candidates`` -> ``compact_manifest_store(
buckets=...)`` against the live store, both sides under the ordinary
OCC protocol. A clone-twin store receives the IDENTICAL merge schedule
with NO maintenance.

Asserted / reported:

- content parity: the maintained and unmaintained twins must end
  bit-identical (compaction never changes content; merges are replayed
  deterministically on both) — checked via two-sided ``exceptAll``;
- liveness: every merge and every compaction commits (bounded retries,
  zero errors) — no deadlock/livelock between the two op kinds;
- the maintenance dividend: final live file count and the
  ``files_read`` of one identical narrow probe merge on each twin
  (maintained store should prune better), plus per-op retry
  distributions showing merge<->compaction conflicts stay bounded.

Both stores use a SHARDED manifest so the newest partial-compaction
path (covering-shard rewrite) is the one under concurrency.

Usage: python scripts/maintenance_probe.py [n_keys]  (default 262144)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BUCKETS = 64
FPB = 4
N_SHARDS = 8
N_WRITERS = 3
ROUNDS = 6
KEYS_PER_MERGE = 64
RETENTION = 3600.0
# Writer w owns buckets {w*4 .. w*4+3}: disjoint across writers, so
# merge-vs-merge conflicts come only from shared manifest commits, and
# merge-vs-compaction conflicts only when maintenance picks a bucket
# mid-stream of its owner.
OWNED = {w: list(range(w * 4, w * 4 + 4)) for w in range(N_WRITERS)}


def _keep_newest(df):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("k").orderBy(F.col("ver").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )


def _narrow_batch(spark, writer: int, ver: int, n_keys: int):
    """KEYS_PER_MERGE keys per owned bucket, in a ver-specific narrow
    band — each merge reads few files but writes up to FPB new ones
    per bucket, inflating the owner's hot set over the rounds."""
    buckets = OWNED[writer]
    base = (ver * 7919 * N_BUCKETS) % n_keys
    frames = None
    for b in buckets:
        f = spark.range(KEYS_PER_MERGE).selectExpr(
            f"({base} + id * {N_BUCKETS} + {b}) % {n_keys} AS k",
            f"CAST({ver} AS INT) AS ver",
            f"CAST(({base} + id * {N_BUCKETS} + {b}) % {n_keys} "
            f"% {N_BUCKETS} AS INT) AS bucket",
        )
        frames = f if frames is None else frames.unionAll(f)
    return frames


def main() -> None:
    from pyspark.sql import SparkSession

    from sp500_stock_etl_spark.hostinfo import host_stamp
    from sp500_stock_etl_spark.io import manifest_store as MS

    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("maintenance-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="sg_maint_probe_")
    stores = {
        m: os.path.join(root, m) for m in ("maintained", "plain")
    }
    base = spark.range(n_keys).selectExpr(
        "id AS k",
        "CAST(0 AS INT) AS ver",
        f"CAST(id % {N_BUCKETS} AS INT) AS bucket",
    )
    for store in stores.values():
        MS.merge_manifest_store(
            store,
            base,
            "k",
            "bucket",
            _keep_newest,
            files_per_bucket=FPB,
            retention_seconds=RETENTION,
            manifest_shards=N_SHARDS,
        )

    report: dict = {"host": host_stamp(), "n_keys": n_keys}
    errors: list[str] = []

    for mode, store in stores.items():
        merge_retries: list[int] = []
        compactions: list[dict] = []
        writers_done = threading.Event()

        def run_writer(writer: int) -> None:
            try:
                for ver in range(1, ROUNDS + 1):
                    st = MS.merge_manifest_store(
                        store,
                        _narrow_batch(spark, writer, ver, n_keys),
                        "k",
                        "bucket",
                        _keep_newest,
                        files_per_bucket=FPB,
                        retention_seconds=RETENTION,
                    )
                    merge_retries.append(st["commit_retries"])
            except Exception as e:  # pragma: no cover - probe guard
                errors.append(f"{mode} w{writer}: {e!r}")

        def run_maintenance() -> None:
            # One tail pass after writers finish binpacks what the
            # last merges left behind.
            tail_done = False
            while not (tail_done and writers_done.is_set()):
                tail_done = writers_done.is_set()
                try:
                    cands = MS.compaction_candidates(
                        store, files_per_bucket=FPB, max_buckets=4
                    )
                    if not cands:
                        time.sleep(0.25)
                        continue
                    st = MS.compact_manifest_store(
                        spark,
                        store,
                        "k",
                        "bucket",
                        files_per_bucket=FPB,
                        retention_seconds=RETENTION,
                        buckets=set(cands),
                    )
                    compactions.append(
                        {
                            "buckets": st["buckets"],
                            "files_before": st["files_before"],
                            "files_after": st["files_after"],
                            "retries": st["commit_retries"],
                        }
                    )
                except Exception as e:  # pragma: no cover
                    errors.append(f"{mode} maint: {e!r}")
                    return

        threads = [
            threading.Thread(target=run_writer, args=(w,))
            for w in range(N_WRITERS)
        ]
        if mode == "maintained":
            threads.append(threading.Thread(target=run_maintenance))
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        # Writer threads are the first N_WRITERS entries.
        for t in threads[:N_WRITERS]:
            t.join()
        writers_done.set()
        for t in threads[N_WRITERS:]:
            t.join()
        wall = round(time.perf_counter() - t0, 2)

        m = MS.read_manifest(store)
        probe = MS.merge_manifest_store(
            store,
            _narrow_batch(spark, 0, ROUNDS + 1, n_keys),
            "k",
            "bucket",
            _keep_newest,
            files_per_bucket=FPB,
            retention_seconds=RETENTION,
        )
        report[mode] = {
            "wall_s": wall,
            "merge_retries": sorted(merge_retries),
            "compactions": len(compactions),
            "compaction_retries": sorted(
                c["retries"] for c in compactions
            ),
            "files_rewritten": sum(
                c["files_before"] for c in compactions
            ),
            "live_files_final": MS._files_total(m),
            "generation": m["generation"],
            "probe_merge_files_read": probe["files_read"],
            "probe_merge_wall_s": probe["wall_s"],
        }
        if mode == "maintained":
            report[mode]["compaction_log"] = compactions

    # Twins saw the same merges + one probe merge each; compaction
    # must not have changed content.
    a = MS.read_store(spark, stores["maintained"])
    b = MS.read_store(spark, stores["plain"])
    report["rows_equal"] = a.count() == b.count() == n_keys
    report["content_parity"] = (
        a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    )
    report["errors"] = errors
    print(json.dumps(report), flush=True)
    if errors or not report["content_parity"] or not report["rows_equal"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
