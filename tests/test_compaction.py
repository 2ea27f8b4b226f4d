"""Small-file compaction: content-identical rewrite into the target
file count (io/writers.compact_parquet)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from sp500_stock_etl_spark.io.readers import load_table
from sp500_stock_etl_spark.io.writers import compact_parquet

SF_DIR = "/root/testdata/sf0.001"


def _snapshot(spark, path):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(path)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .collect()
    )


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frags")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    # Simulate an incremental sink: 64 tiny files.
    li.repartition(64).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 64
    before = _snapshot(spark, path)

    stats = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)

    assert stats["files_before"] == 64
    assert stats["files_after"] < 64
    assert len(glob.glob(f"{path}/*.parquet")) == stats["files_after"]
    assert _snapshot(spark, path) == before, "compaction must not change data"


def test_compact_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "ok")
    load_table(spark, SF_DIR, "lineitem").select("l_orderkey").coalesce(
        1
    ).write.parquet(path)
    stats = compact_parquet(spark, path, target_file_bytes=128 * 1024 * 1024)
    assert stats["files_before"] == stats["files_after"] == 1


def test_compact_refuses_partitioned_layout(spark, tmp_path):
    """A flat rewrite would silently drop the Hive partition layout —
    compact_parquet must refuse instead."""
    import pytest

    path = str(tmp_path / "parts")
    load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    ).repartition(8).write.partitionBy("l_returnflag").parquet(path)
    with pytest.raises(ValueError, match="Hive-partitioned"):
        compact_parquet(spark, path, target_file_bytes=1)


def test_compact_leaves_no_tmp_dirs(spark, tmp_path):
    """The rename-aside swap cleans up both __compact_tmp and
    __compact_old on success."""
    import os

    path = str(tmp_path / "swap")
    load_table(spark, SF_DIR, "lineitem").select("l_orderkey").repartition(
        16
    ).write.parquet(path)
    compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")
    assert len(glob.glob(f"{path}/*.parquet")) >= 1


def test_atomic_bucketed_write(spark, tmp_path):
    """write_bucketed_table_atomic: stage → rename publish preserves
    the bucketed no-exchange join layout, replays idempotently, and
    leaves no staging/aside directories behind (r9 verdict item 3)."""
    import os

    from sp500_stock_etl_spark.io.writers import write_bucketed_table_atomic

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    p1 = str(tmp_path / "b_li_atomic")
    p2 = str(tmp_path / "b_ord_atomic")
    write_bucketed_table_atomic(li, "b_li_atomic", "l_orderkey", 4, path=p1)
    write_bucketed_table_atomic(
        orders, "b_ord_atomic", "o_orderkey", 4, path=p2
    )

    # Contents survive the rename.
    assert spark.table("b_li_atomic").count() == li.count()

    # The bucket layout survives: co-located join plans with NO
    # Exchange on either side (bucket ids live in file names, and the
    # CREATE ... CLUSTERED BY over the published location keeps the
    # metadata).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_li_atomic").join(
            spark.table("b_ord_atomic"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # Overwrite replay: same table+path again, halved content wins.
    li_half = li.where(F.col("l_orderkey") % 2 == 0)
    write_bucketed_table_atomic(
        li_half, "b_li_atomic", "l_orderkey", 4, path=p1
    )
    assert spark.table("b_li_atomic").count() == li_half.count()

    # No staging or aside dirs left in the parent.
    leftovers = [
        d for d in os.listdir(tmp_path) if "__stage__" in d or "__old__" in d
    ]
    assert leftovers == [], leftovers
    spark.sql("DROP TABLE IF EXISTS b_li_atomic")
    spark.sql("DROP TABLE IF EXISTS b_ord_atomic")


def test_atomic_write_unique_staging_namespaces(spark, tmp_path):
    """Concurrent atomic writes to per-batch paths under one store
    root: every write job stages in its OWN directory (uuid4 per
    call — the FileOutputCommitter-collision fix), all succeed, and
    the final store is the exact union of the batches."""
    import os
    import threading

    from sp500_stock_etl_spark.io import writers as W

    staged: list[str] = []
    real_rename = os.rename

    def spying_rename(src, dst):
        if "__stage__" in str(src):
            staged.append(str(src))
        return real_rename(src, dst)

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .limit(200)
        .cache()
    )
    li.count()
    store_root = tmp_path / "store"
    store_root.mkdir()
    errors: list[Exception] = []

    def one_batch(i: int) -> None:
        try:
            W.write_bucketed_table_atomic(
                li,
                f"b_stress_{i}",
                "l_orderkey",
                2,
                path=str(store_root / f"delta_{i}"),
            )
        except Exception as e:  # noqa: BLE001 — the assertion IS no-error
            errors.append(e)

    os.rename = spying_rename
    try:
        threads = [
            threading.Thread(target=one_batch, args=(i,)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        os.rename = real_rename

    assert errors == [], errors
    assert len(staged) == 8
    assert len(set(staged)) == 8, "staging namespaces must be disjoint"
    total = sum(
        spark.read.parquet(str(store_root / f"delta_{i}")).count()
        for i in range(8)
    )
    assert total == 8 * li.count()
    for i in range(8):
        spark.sql(f"DROP TABLE IF EXISTS b_stress_{i}")
    li.unpersist()


def test_merge_touched_partitions(spark, tmp_path):
    """The bucketed CDC merge must rewrite ONLY the partitions a batch
    touches: untouched bucket directories stay byte-identical on disk
    (same files, same mtimes), touched buckets are rewritten with
    last-write-wins content, and the returned touched list is exact."""
    import os

    from pyspark.sql import functions as F

    from sp500_stock_etl_spark.io.writers import merge_touched_partitions

    def keep_newest(df):
        from pyspark.sql import Window

        w = Window.partitionBy("k").orderBy(F.col("ver").desc())
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
            .drop("rn")
        )

    store = str(tmp_path / "store")
    base = spark.range(0, 80).select(
        F.col("id").alias("k"),
        F.lit(0).alias("ver"),
        (F.col("id") % 8).cast("int").alias("bucket"),
    )
    t0 = merge_touched_partitions(store, base, "bucket", keep_newest)
    assert t0 == list(range(8))

    def snapshot(bucket):
        d = f"{store}/bucket={bucket}"
        return sorted(
            (f, os.stat(f"{d}/{f}").st_mtime_ns, os.path.getsize(f"{d}/{f}"))
            for f in os.listdir(d)
            if not f.startswith((".", "_"))
        )

    before = {b: snapshot(b) for b in range(8)}

    # Batch touches ONLY buckets 1 and 3: updates k=1 (ver 1) and
    # inserts k=99 (bucket 3).
    batch = spark.createDataFrame(
        [(1, 1, 1), (99, 1, 3)], "k long, ver int, bucket int"
    )
    touched = merge_touched_partitions(store, batch, "bucket", keep_newest)
    assert touched == [1, 3]

    for b in range(8):
        if b in (1, 3):
            assert snapshot(b) != before[b], f"bucket {b} must be rewritten"
        else:
            assert snapshot(b) == before[b], (
                f"untouched bucket {b} was rewritten"
            )

    final = spark.read.parquet(store)
    assert final.count() == 81  # 80 originals + 1 insert
    assert final.where("k = 1").select("ver").first()[0] == 1  # updated
    assert final.where("k = 99").count() == 1  # inserted
    assert final.where("k = 2").select("ver").first()[0] == 0  # carried


def test_atomic_publish_restores_old_store_on_persistent_failure(
    spark, tmp_path, monkeypatch
):
    """Publish-loop hardening (ADVICE r10, writers.py mediums): when
    the rename-in fails PERSISTENTLY (EACCES-style, not a race), the
    previous store must be restored at ``path`` — not deleted — and
    the staged data must survive for manual recovery."""
    import os

    from sp500_stock_etl_spark.io.writers import write_bucketed_table_atomic

    df = spark.range(100).withColumnRenamed("id", "k")
    p = str(tmp_path / "b_restore")
    write_bucketed_table_atomic(df, "b_restore_v1", "k", 4, path=p)
    before = sorted(os.listdir(p))

    real_rename = os.rename

    def failing_rename(src, dst):
        # Only the rename-IN (stage -> path) fails; aside/restore work.
        if "__stage__" in str(src) and str(dst) == p:
            raise PermissionError(13, "injected EACCES", str(src))
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    half = df.where("k % 2 = 0")
    try:
        write_bucketed_table_atomic(half, "b_restore_v2", "k", 4, path=p)
        raise AssertionError("publish must fail under injected EACCES")
    except RuntimeError as e:
        assert "50 straight races" in str(e)
    finally:
        monkeypatch.setattr(os, "rename", real_rename)

    # The old store is fully restored at path — nothing was destroyed.
    assert os.path.isdir(p), "previous store must survive the failure"
    assert sorted(os.listdir(p)) == before
    assert spark.read.parquet(p).count() == 100
    # The staged copy is preserved for recovery.
    stage_dirs = [d for d in os.listdir(tmp_path) if "__stage__" in d]
    assert len(stage_dirs) == 1, stage_dirs
    spark.sql("DROP TABLE IF EXISTS b_restore_v1")
    spark.sql("DROP TABLE IF EXISTS b_restore_v2")


def test_merge_touched_files(spark, tmp_path):
    """File-level CDC merge (r10 verdict item 2): read-back tracks
    touched KEYS, not touched buckets — files whose footer key range
    the batch misses are neither read nor rewritten, and the final
    store equals the whole-store resolve."""
    import glob
    import hashlib
    import os

    from sp500_stock_etl_spark.io.writers import merge_touched_files

    def keep_newest(df):
        from pyspark.sql import Window as W

        w = W.partitionBy("k").orderBy(F.col("ver").desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where("__rn = 1")
            .drop("__rn")
        )

    store = str(tmp_path / "fstore")
    # 4 buckets x 4 range files; keys 0..4095, ver 0.
    base = spark.range(4096).selectExpr(
        "id AS k", "CAST(0 AS INT) AS ver", "CAST(id % 4 AS INT) AS bucket"
    )
    stats0 = merge_touched_files(store, base, "k", "bucket", keep_newest)
    assert stats0["files_read"] == 0

    def snap():
        return {
            p: hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in glob.glob(os.path.join(store, "bucket=*", "*.parquet"))
        }

    before = snap()
    # Batch: keys 0..63 (one narrow range) in buckets 0..3, ver 1,
    # plus a brand-new key 9999.
    batch = spark.range(64).selectExpr(
        "id AS k", "CAST(1 AS INT) AS ver", "CAST(id % 4 AS INT) AS bucket"
    ).unionByName(
        spark.createDataFrame([(9999, 1, 3)], "k long, ver int, bucket int")
    )
    stats = merge_touched_files(store, batch, "k", "bucket", keep_newest)

    # Pruning has teeth: the store is key-range-clustered, so the
    # 0..63 batch intersects only the low-range file of each bucket.
    assert 0 < stats["files_read"] < stats["files_total"], stats
    assert stats["bytes_read"] < stats["bytes_total"] / 2, stats

    # Untouched files byte-identical on disk.
    after = snap()
    replaced_or_new = set(after) ^ set(before)
    for p in set(after) & set(before):
        assert after[p] == before[p], f"untouched file rewritten: {p}"
    assert replaced_or_new, "merge must have written something"

    # Contents equal the whole-store resolve.
    final = spark.read.parquet(store)
    assert final.count() == 4097
    assert final.where("k < 64").agg(F.min("ver")).first()[0] == 1
    assert final.where("k >= 64 and k < 4096").agg(F.max("ver")).first()[0] == 0
    assert final.where("k = 9999").count() == 1
    # One row per key (upsert invariant).
    assert final.select("k").distinct().count() == 4097


def test_merge_touched_files_untouched_bucket_never_opened(spark, tmp_path):
    """A batch confined to one bucket leaves every other bucket's
    files out of both the read set and the write set."""
    from sp500_stock_etl_spark.io.writers import merge_touched_files

    def keep_max(df):
        return df.groupBy("k", "bucket").agg(F.max("ver").alias("ver")).select(
            "k", "ver", "bucket"
        )

    store = str(tmp_path / "fstore2")
    base = spark.range(1000).selectExpr(
        "id AS k", "CAST(0 AS INT) AS ver", "CAST(id % 8 AS INT) AS bucket"
    )
    merge_touched_files(store, base, "k", "bucket", keep_max)
    batch = spark.createDataFrame([(8, 1, 0)], "k long, ver int, bucket int")
    stats = merge_touched_files(store, batch, "k", "bucket", keep_max)
    assert stats["touched_buckets"] == [0]
    assert stats["files_read"] >= 1
    # All non-bucket-0 data intact and single-sourced.
    final = spark.read.parquet(store)
    assert final.count() == 1000
    assert final.where("k = 8").first()["ver"] == 1


def test_compact_store_files_restores_clustering(spark, tmp_path):
    """After merges degrade the file-level store (more files,
    overlapping ranges), compact_store_files rewrites one clustered
    generation: fewer files, identical content, and a subsequent
    clustered merge prunes again."""
    from sp500_stock_etl_spark.io.writers import (
        compact_store_files,
        merge_touched_files,
    )

    def keep_max(df):
        return df.groupBy("k", "bucket").agg(F.max("ver").alias("ver")).select(
            "k", "ver", "bucket"
        )

    store = str(tmp_path / "cstore")
    base = spark.range(4096).selectExpr(
        "id AS k", "CAST(0 AS INT) AS ver", "CAST(id % 4 AS INT) AS bucket"
    )
    merge_touched_files(store, base, "k", "bucket", keep_max)
    # Several scattered merges -> appended files with wide ranges.
    for ver in (1, 2, 3):
        batch = spark.range(64).selectExpr(
            f"id * 64 AS k", f"CAST({ver} AS INT) AS ver",
            "CAST((id * 64) % 4 AS INT) AS bucket",
        )
        merge_touched_files(store, batch, "k", "bucket", keep_max)

    before = sorted(map(tuple, spark.read.parquet(store).collect()))
    stats = compact_store_files(spark, store, "k", "bucket")
    assert stats["files_after"] <= stats["files_before"]
    after = sorted(map(tuple, spark.read.parquet(store).collect()))
    assert after == before, "compaction must not change content"

    # Clustered pruning works again post-compaction.
    batch = spark.range(64).selectExpr(
        "id AS k", "CAST(9 AS INT) AS ver", "CAST(id % 4 AS INT) AS bucket"
    )
    st = merge_touched_files(store, batch, "k", "bucket", keep_max)
    assert st["files_read"] < st["files_total"], st


def test_merge_touched_files_interval_fallback(spark, tmp_path):
    """r11 verdict item 3: the probe-path merge no longer collects an
    unbounded key set. Forcing the limit-probe to overflow (tiny
    max_collected_keys) or skipping it via batch_keys_hint must flip
    pruning to per-bucket [min, max] intervals and leave the final
    store CONTENT identical to the keys-mode merge (interval pruning
    is a superset — it may read more files, never fewer)."""
    from sp500_stock_etl_spark.io.writers import merge_touched_files

    def keep_newest(df):
        from pyspark.sql import Window as W

        w = W.partitionBy("k").orderBy(F.col("ver").desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where("__rn = 1")
            .drop("__rn")
        )

    base = spark.range(4096).selectExpr(
        "id AS k", "CAST(0 AS INT) AS ver", "CAST(id % 4 AS INT) AS bucket"
    )
    batch = spark.range(64).selectExpr(
        "id AS k", "CAST(1 AS INT) AS ver", "CAST(id % 4 AS INT) AS bucket"
    )

    def run(store, **kw):
        merge_touched_files(store, base, "k", "bucket", keep_newest)
        return merge_touched_files(
            store, batch, "k", "bucket", keep_newest, **kw
        )

    s_keys = run(str(tmp_path / "keys"))
    s_over = run(str(tmp_path / "overflow"), max_collected_keys=8)
    s_hint = run(str(tmp_path / "hint"), batch_keys_hint=10**9)

    # Overflow and hint paths both prune by intervals; keys mode was
    # the r10 behavior. Interval selection is a superset of the key
    # selection and still strictly smaller than the store.
    for st in (s_over, s_hint):
        assert s_keys["files_read"] <= st["files_read"], (s_keys, st)
        assert 0 < st["files_read"] < st["files_total"], st

    rows = {
        name: sorted(
            tuple(r)
            for r in spark.read.parquet(str(tmp_path / name))
            .select("k", "ver")
            .collect()
        )
        for name in ("keys", "overflow", "hint")
    }
    assert rows["keys"] == rows["overflow"] == rows["hint"]
