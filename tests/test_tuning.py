"""Partition advisor (tuning.py): the constants must reproduce the
r10 measured series on the risk capstone (BASELINE.md §12) — 600x
smooth at default partitioning (advice = None), 1000x advised to
~256 initial partitions — and the context manager must be a strict
no-op in the smooth regime."""

from __future__ import annotations

from pyspark.sql import types as T

from sp500_stock_etl_spark import tuning


_STOCK_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.LongType()),
        T.StructField("trade_date", T.DateType()),
        T.StructField("order_key", T.LongType()),
        T.StructField("line_number", T.IntegerType()),
        T.StructField("cents", T.LongType()),
    ]
)


def test_calibration_reproduces_measured_series(spark):
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        base = 600_000
        # 600x = 360M rows: measured smooth -> no advice.
        est = tuning.sort_inflight_bytes(base * 600, _STOCK_SCHEMA)
        assert tuning.advise_initial_partitions(spark, est) is None
        # 1000x = 600M rows: measured OOM at 32 -> advise ~256.
        est = tuning.sort_inflight_bytes(base * 1000, _STOCK_SCHEMA)
        advised = tuning.advise_initial_partitions(spark, est)
        assert advised is not None and 128 <= advised <= 512, advised
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")


def test_smooth_regime_is_strict_noop(spark):
    key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    with tuning.spill_safe_partitions(spark, 10_000_000) as advised:
        assert advised is None
        try:
            val = spark.conf.get(key)
        except Exception:
            val = None
        assert val is None, "smooth regime must not touch the conf"


def test_conf_set_and_restored_past_cliff(spark):
    key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    est = tuning.sort_inflight_bytes(600_000 * 1000, _STOCK_SCHEMA)
    with tuning.spill_safe_partitions(spark, est) as advised:
        assert advised is not None
        assert spark.conf.get(key) == str(advised)
    try:
        val = spark.conf.get(key)
    except Exception:
        val = None
    assert val is None, "conf must be restored after the action"


def test_row_width_estimates():
    assert tuning.estimated_row_bytes(_STOCK_SCHEMA) == 56
    wide = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("a", T.ArrayType(T.LongType())),
        ]
    )
    assert tuning.estimated_row_bytes(wide) == 16 + 8 + 24 + 8 + 64


def test_manifest_shard_advisor():
    """Flat inside the measured comfort zone; ~target entries/shard
    past it; capped root size at pathological counts."""
    from sp500_stock_etl_spark.tuning import (
        MANIFEST_MAX_SHARDS,
        advise_manifest_shards,
    )

    assert advise_manifest_shards(256) is None
    assert advise_manifest_shards(10_000) is None
    assert advise_manifest_shards(10_001) == 3
    assert advise_manifest_shards(200_000) == 50  # the 100 TB point
    assert advise_manifest_shards(10**8) == MANIFEST_MAX_SHARDS
