"""Manifest generations over the file-level CDC store
(io/manifest_store.py): atomic reader-visible generations, one-
generation retention of replaced files, manifest-driven pruning
(no footer reads on merge), and reader consistency under concurrent
merges."""

from __future__ import annotations

import glob
import os
import threading

from pyspark.sql import functions as F

from sp500_stock_etl_spark.io import manifest_store as MS


def _keep_newest(df):
    from pyspark.sql import Window as W

    w = W.partitionBy("k").orderBy(F.col("ver").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
    )


def _base(spark, n=4096):
    return spark.range(n).selectExpr(
        "id AS k", "CAST(0 AS INT) AS ver", "CAST(id % 4 AS INT) AS bucket"
    )


def _batch(spark, ver, n=64):
    return spark.range(n).selectExpr(
        f"id AS k", f"CAST({ver} AS INT) AS ver",
        "CAST(id % 4 AS INT) AS bucket",
    )


def test_generations_prune_and_retain(spark, tmp_path):
    store = str(tmp_path / "mstore")
    s0 = MS.merge_manifest_store(
        store, _base(spark), "k", "bucket", _keep_newest
    )
    assert s0["generation"] == 0 and s0["files_read"] == 0

    s1 = MS.merge_manifest_store(
        store, _batch(spark, 1), "k", "bucket", _keep_newest
    )
    assert s1["generation"] == 1
    # Pruned selection straight from the manifest ranges.
    assert 0 < s1["files_read"] < s1["files_total"], s1
    assert s1["bytes_read"] < s1["bytes_total"] / 2

    # Replaced files RETAINED on disk (dead, not deleted)...
    m = MS.read_manifest(store)
    live = {f["path"] for f in m["files"]}
    on_disk = {
        os.path.relpath(p, store)
        for p in glob.glob(os.path.join(store, "bucket=*", "*.parquet"))
    }
    assert set(m["dead"]) <= on_disk - live
    assert m["dead"], "generation 1 must retain generation 0's replaced files"

    # ...and the manifest-pinned read sees ONLY the live generation.
    final = MS.read_store(spark, store)
    assert final.count() == 4096
    assert final.where("k < 64").agg(F.min("ver")).first()[0] == 1
    assert final.select("k").distinct().count() == 4096

    # Next merge GCs the generation that has been dead one full swap.
    dead_before = set(m["dead"])
    MS.merge_manifest_store(
        store, _batch(spark, 2), "k", "bucket", _keep_newest
    )
    on_disk2 = {
        os.path.relpath(p, store)
        for p in glob.glob(os.path.join(store, "bucket=*", "*.parquet"))
    }
    assert not (dead_before & on_disk2), "gen-0 dead files must be GC'd"
    assert MS.read_store(spark, store).where("k < 64").agg(
        F.min("ver")
    ).first()[0] == 2


def test_untouched_files_never_rewritten(spark, tmp_path):
    import hashlib

    store = str(tmp_path / "mstore2")
    MS.merge_manifest_store(store, _base(spark), "k", "bucket", _keep_newest)

    def snap():
        return {
            p: hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in glob.glob(os.path.join(store, "bucket=*", "*.parquet"))
        }

    before = snap()
    MS.merge_manifest_store(
        store, _batch(spark, 1), "k", "bucket", _keep_newest
    )
    after = snap()
    for p in set(before) & set(after):
        assert before[p] == after[p], f"existing file rewritten: {p}"


def test_reader_consistency_under_merges(spark, tmp_path):
    """A reader loop never observes a partial generation: with
    update-only batches every legitimate generation has EXACTLY the
    base row count and one row per key — any append/delete tearing
    would show up as a different count."""
    store = str(tmp_path / "mstore3")
    n = 2048
    MS.merge_manifest_store(
        store, _base(spark, n), "k", "bucket", _keep_newest
    )

    stop = threading.Event()
    errors: list[str] = []

    def reader() -> None:
        while not stop.is_set():
            c = MS.read_store(spark, store).count()
            if c != n:
                errors.append(f"saw {c} rows (expected {n})")
                return

    t = threading.Thread(target=reader)
    t.start()
    try:
        for ver in range(1, 6):
            MS.merge_manifest_store(
                store, _batch(spark, ver, 128), "k", "bucket", _keep_newest
            )
    finally:
        stop.set()
        t.join()
    assert errors == [], errors
    assert MS.read_store(spark, store).count() == n


def test_compact_manifest_store(spark, tmp_path):
    """Compaction resets the file count to one clustered generation,
    preserves content exactly, retains the old generation for lagging
    readers, and restores pruning effectiveness."""
    from sp500_stock_etl_spark.io.manifest_store import (
        compact_manifest_store,
    )

    store = str(tmp_path / "mstore4")
    MS.merge_manifest_store(store, _base(spark), "k", "bucket", _keep_newest)
    for ver in (1, 2, 3):
        MS.merge_manifest_store(
            store, _batch(spark, ver, 256), "k", "bucket", _keep_newest
        )
    m_before = MS.read_manifest(store)
    before_rows = sorted(map(tuple, MS.read_store(spark, store).collect()))

    stats = compact_manifest_store(spark, store, "k", "bucket")
    assert stats["files_after"] <= stats["files_before"]
    assert sorted(map(tuple, MS.read_store(spark, store).collect())) == (
        before_rows
    ), "compaction must not change content"

    # Old generation retained (dead) until the next swap GCs it.
    m = MS.read_manifest(store)
    assert set(m["dead"]) == {f["path"] for f in m_before["files"]}
    on_disk = {
        os.path.relpath(p, store)
        for p in glob.glob(os.path.join(store, "bucket=*", "*.parquet"))
    }
    assert set(m["dead"]) <= on_disk

    # Post-compaction, a narrow batch prunes again.
    st = MS.merge_manifest_store(
        store, _batch(spark, 9, 64), "k", "bucket", _keep_newest
    )
    assert st["files_read"] < st["files_total"], st


def test_interval_fallback_for_huge_batches(spark, tmp_path):
    """Past max_collected_keys the merge never collects the key set —
    it prunes by per-bucket [min,max] intervals instead. Weaker
    pruning (interval superset), identical results."""
    store = str(tmp_path / "mstore5")
    MS.merge_manifest_store(store, _base(spark), "k", "bucket", _keep_newest)
    batch = _batch(spark, 1, 64)
    stats = MS.merge_manifest_store(
        store, batch, "k", "bucket", _keep_newest, max_collected_keys=8
    )
    # Narrow interval still prunes (keys 0..63 -> low-range files).
    assert 0 < stats["files_read"] < stats["files_total"], stats
    final = MS.read_store(spark, store)
    assert final.count() == 4096
    assert final.where("k < 64").agg(F.min("ver")).first()[0] == 1
    assert final.select("k").distinct().count() == 4096
