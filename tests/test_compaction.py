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
