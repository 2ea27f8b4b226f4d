"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``sp500_stock_etl_spark.plans.registry`` — the
engine's query registry is the single source of truth; every operator
from SURVEY.md §2 lands there with a matching DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001; driver checks rows>0 + stable schema."""
    from sp500_stock_etl_spark.plans.flagship import flagship_metrics
    from sp500_stock_etl_spark.session import harden

    harden(spark)
    return flagship_metrics(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
