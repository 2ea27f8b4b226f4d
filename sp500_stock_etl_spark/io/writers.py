"""Sinks (SURVEY.md §2.2).

- K1: fully-quoted CSV reproducing the reference's pandas writer
  (dags/sp500_dag.py.py:234-242): QUOTE_ALL, '%.4f' floats, '' for
  NULL, yyyy-MM-dd dates, header. An ``s3a://`` path subsumes the
  separate S3 upload task (K2) — one committer, no /tmp staging.
- K3: warehouse load → a date-partitioned parquet table. At 100 TB
  this is the layout that makes dynamic partition pruning work for
  every date-ranged query (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def write_quoted_csv(df: DataFrame, path: str, float_decimals: int = 4) -> None:
    """K1: the reference's CSV contract (dags/sp500_dag.py.py:234-242).

    Float formatting ('%.4f') is applied as a column expression before
    the sink because Spark's CSV writer has no float_format option;
    format_number then strip the thousands separator.
    """
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            c = F.regexp_replace(F.format_number(c, float_decimals), ",", "")
        cols.append(c.alias(f.name))
    (
        df.select(*cols)
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("nullValue", "")
        .option("emptyValue", "")
        .option("dateFormat", "yyyy-MM-dd")
        .csv(path)
    )


def write_partitioned_table(df: DataFrame, path: str, partition_col: str = "trade_date") -> None:
    """K3: parquet fact table partitioned by date.

    Replaces the reference's COPY INTO (dags/sp500_dag.py.py:353-378).
    Idempotent re-load (the reference's replace=True + PURGE=TRUE) is
    overwrite-by-partition: dynamic partitionOverwriteMode replaces
    only the partitions present in ``df``.
    """
    spark = df.sparkSession
    # The write is an eager action, so save/restore around it is sound
    # (no other query in this session observes the changed conf).
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_bucketed_table(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 16
) -> None:
    """Co-located join layout (SURVEY.md §7.4): hash-bucketed, sorted
    managed table. Two tables bucketed the same way join with NO
    exchange on either side (verified in tests/test_scale_plans.py) —
    at 100 TB this is the difference between a fact-fact join that
    reshuffles both inputs and one that streams bucket-to-bucket.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )
