"""Queries covering the reference's own operator surface
(SURVEY.md §2.1-§2.8, §2.10): scans, filters/predicates, scalar
derivations, window lag metrics, union, sort/limit, QA aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.rounding import sql_round
from ..io.readers import load_table
from .flagship import flagship_metrics
from .registry import register

# ---------------------------------------------------------------------------
# Flagship: the whole reference analytics kernel in one plan
# (dags/sp500_dag.py.py:95-216; SURVEY.md §7.1 step 2).
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = f"""
WITH quotes AS (
    SELECT l_partkey AS symbol,
           CAST(l_shipdate AS DATE) AS trade_date,
           l_extendedprice AS close,
           l_extendedprice * (1.0 + l_tax) AS high,
           l_extendedprice * (1.0 - l_discount) AS low,
           l_quantity AS volume,
           l_orderkey AS order_key,
           l_linenumber AS line_number
    FROM lineitem
), w AS (
    SELECT *,
           lag(close) OVER (
               PARTITION BY symbol
               ORDER BY trade_date, order_key, line_number) AS prev_close
    FROM quotes
)
SELECT trade_date,
       symbol,
       {sql_round('close', 2)} AS close,
       {sql_round('high', 2)} AS high,
       {sql_round('low', 2)} AS low,
       CAST(volume AS DOUBLE) AS volume,
       {sql_round('coalesce(close - prev_close, 0)', 4)} AS close_change,
       {sql_round('coalesce((close / prev_close - 1.0) * 100.0, 0)', 4)} AS close_pct_change,
       {sql_round('(high - low)', 4)} AS daily_range,
       {sql_round('coalesce((high - low) / low * 100.0, 0)', 4)} AS daily_range_pct
FROM w
WHERE trade_date IS NOT NULL AND symbol IS NOT NULL AND close IS NOT NULL
ORDER BY trade_date, symbol
"""


@register(
    "flagship_window_metrics",
    _FLAGSHIP_ORACLE,
    doc="scan→project→cast/round→lag window→null-drop→sort (SURVEY §7.1.2)",
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship_metrics(spark, sf_dir)
