"""Local stand-in for the driver's DuckDB-oracle comparison
(SURVEY.md §5.2): run a registry query in Spark and its oracle SQL in
DuckDB over the same parquet files; compare row count, column names,
and order-insensitive values (exact on non-floats; exact-by-default on
floats since both engines compute in IEEE double — any query that
can't hold exact float parity must round inside BOTH sides)."""

from __future__ import annotations

import math

import duckdb

from sp500_stock_etl_spark.schemas import TESTDATA_TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return ("N",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    return (type(v).__name__, str(v))


def _rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    a = _rows_canon(spark_cols, spark_rows)
    b = _rows_canon(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"values differ; first mismatched sorted rows: {diffs}"
    return True, f"ok ({len(spark_rows)} rows)"
