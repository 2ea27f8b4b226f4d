"""The correctness gate, run locally: every registry query with an
oracle must hash-match DuckDB at sf0.01 (mirrors the driver's t2)."""

from __future__ import annotations

import pytest

from sp500_stock_etl_spark.plans.registry import all_queries
from tests.parity import compare, duckdb_connect

QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_correct):
    c = duckdb_connect(sf_correct)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, sf_correct, con):
    q = QUERIES[name]
    df = q.spark_fn(spark, sf_correct)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors driver fallback
        return
    ok, msg = compare(df, con, q.oracle)
    assert ok, f"{name}: {msg}"
