"""Idempotent batch reload (the reference's ``replace=True`` /
``PURGE=TRUE`` re-run semantics, dags/sp500_dag.py.py:285,378):
overwrite-by-partition via dynamic partitionOverwriteMode.

Contract: re-running the same load is a no-op (same rows), and
re-loading ONE date's batch replaces exactly that partition — other
partitions are untouched, never duplicated, never dropped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sp500_stock_etl_spark.io.readers import load_table
from sp500_stock_etl_spark.io.writers import write_partitioned_table

SF_DIR = "/root/testdata/sf0.001"


def _daily(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    return li.select(
        F.to_date("l_shipdate").alias("trade_date"),
        F.col("l_partkey").alias("symbol"),
        F.col("l_extendedprice").alias("close"),
    ).where(F.col("trade_date").between("1996-01-01", "1996-01-31"))


def _snapshot(spark, path):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(path)
        .select("trade_date", "symbol", "close")
        .collect()
    )


def test_rerun_same_batch_is_noop(spark, tmp_path):
    path = str(tmp_path / "stock_table")
    df = _daily(spark)
    write_partitioned_table(df, path)
    first = _snapshot(spark, path)
    assert first, "fixture window must be non-empty"
    write_partitioned_table(df, path)  # the daily re-run
    assert _snapshot(spark, path) == first


def test_partial_reload_replaces_only_its_partition(spark, tmp_path):
    path = str(tmp_path / "stock_table")
    df = _daily(spark)
    write_partitioned_table(df, path)
    before = _snapshot(spark, path)
    (some_day,) = (
        df.select(F.max("trade_date").alias("d")).collect()[0].asDict().values()
    )

    # Corrected batch for one day: same rows, prices bumped.
    patch = df.where(F.col("trade_date") == F.lit(some_day)).withColumn(
        "close", F.col("close") + 1.0
    )
    write_partitioned_table(patch, path)

    after = _snapshot(spark, path)
    assert len(after) == len(before), "no rows gained or lost"
    changed = [r for r in after if r[0] == some_day]
    untouched_before = [r for r in before if r[0] != some_day]
    untouched_after = [r for r in after if r[0] != some_day]
    assert untouched_after == untouched_before, "other partitions intact"
    assert changed == sorted(
        (r[0], r[1], r[2] + 1.0) for r in before if r[0] == some_day
    ), "target partition fully replaced by the corrected batch"


def test_conf_restored_after_write(spark, tmp_path):
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    write_partitioned_table(_daily(spark), str(tmp_path / "t"))
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static") == prev
    ), "writer must not leak session conf"
