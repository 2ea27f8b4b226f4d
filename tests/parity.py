"""Local stand-in for the driver's DuckDB-oracle comparison
(SURVEY.md §5.2): run a registry query in Spark and its oracle SQL in
DuckDB over the same parquet files; compare row count, column names,
and order-insensitive values.

Round-2 hardening: the comparison now goes through pandas on BOTH
sides (``DataFrame.toPandas()`` vs ``duckdb .df()``), exactly like the
verify driver, instead of ``collect()``/``fetchall()``.  That is the
path where terminal-type skew shows up: DuckDB's ``.df()`` converts
DECIMAL sums to float64 and ``sum(BIGINT)`` (HUGEINT) to float64 or
object, while Spark's ``toPandas()`` yields ``decimal.Decimal``
objects and int64 — values that stringify differently even when
numerically equal.  Registry queries must therefore normalize terminal
aggregate types (decimal sums → DOUBLE on both engines, DuckDB integer
sums → CAST AS BIGINT); this comparator exists to catch any query that
doesn't.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from sp500_stock_etl_spark.schemas import TESTDATA_TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    """Canonical, hashable form of one cell — type-sensitive on purpose.

    Floats go through ``repr`` (bitwise-distinct values stay distinct,
    -0.0 != +0.0); dates and timestamps are unified (Spark's
    ``datetime.date`` vs DuckDB's midnight ``Timestamp`` compare equal,
    matching round-1 driver evidence: every DateType query hashed
    green); everything else keeps its type name so a
    ``decimal.Decimal`` column on one side and a float64 column on the
    other mismatch exactly as they do under the driver's hash.
    """
    import datetime as _dt

    if v is None:
        return ("N",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, (np.floating,)):
        f = float(v)
        if math.isnan(f):
            return ("nan",)
        return ("f", repr(f))
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (pd.Timestamp, np.datetime64, _dt.datetime)):
        if pd.isna(v):
            return ("N",)
        return ("ts", str(pd.Timestamp(v)))
    if isinstance(v, _dt.date):
        return ("ts", str(pd.Timestamp(v)))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("l", tuple(_canon(x) for x in v))
    if pd.isna(v):
        return ("N",)
    return (type(v).__name__, str(v))


def _pdf_canon(pdf: pd.DataFrame):
    # Column-wise extraction: pandas iterrows() would coerce mixed
    # numeric rows to a common dtype (int64+float64 → all float64),
    # hiding exactly the terminal-type skew this comparator hunts.
    cols = sorted(pdf.columns)
    col_vals = [list(pdf[c]) for c in cols]
    rows = [
        tuple(_canon(col_vals[j][i]) for j in range(len(cols)))
        for i in range(len(pdf))
    ]
    return sorted(rows)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    spark_pdf = spark_df.toPandas()
    duck_pdf = con.execute(sql).df()

    spark_cols, duck_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if spark_cols != duck_cols:
        return False, f"columns differ: spark={spark_cols} duck={duck_cols}"
    if len(spark_pdf) != len(duck_pdf):
        return (
            False,
            f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}",
        )
    a = _pdf_canon(spark_pdf)
    b = _pdf_canon(duck_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"values differ; first mismatched sorted rows: {diffs}"
    return True, f"ok ({len(spark_pdf)} rows)"
