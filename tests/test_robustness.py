"""Robustness + semantics-trap tests (SURVEY.md §5.2.4, §7.5):
corrupt-row quarantine (C5), approx-distinct monitoring accuracy (A2
scale path), cross-engine rounding bit-parity on adversarial values,
and property-based window-semantics checks.
"""

from __future__ import annotations

import duckdb
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sp500_stock_etl_spark.functions.rounding import round_half_up, sql_round
from sp500_stock_etl_spark.io.readers import load_table, read_stock_csv
from sp500_stock_etl_spark.plans.stock_pipeline import stock_metrics


def test_dropmalformed_quarantines_bad_arity(spark, tmp_path):
    """ON_ERROR='CONTINUE' semantics (dags/sp500_dag.py.py:377): a row
    with the wrong field count is dropped, the load continues."""
    src = tmp_path / "bad.csv"
    src.write_text(
        "Symbol,Close\n"
        '"A","1.5"\n'
        '"BAD","2.0","EXTRA","MORE"\n'
        '"B","2.5"\n'
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("Symbol", T.StringType()), T.StructField("Close", T.DoubleType())]
    )
    got = {r.Symbol for r in read_stock_csv(spark, str(src), schema, drop_malformed=True).collect()}
    assert got == {"A", "B"}


def test_approx_count_distinct_within_5pct(spark, sf_correct):
    """A2 at scale: HLL monitoring path must track exact NDV."""
    li = load_table(spark, sf_correct, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey").alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


# Adversarial rounding inputs: shortest-decimal .5 boundaries, exact
# binary halves, negatives, zero, huge/tiny magnitudes.
_HARD_VALUES = [
    0.0, -0.0, 2.675, -2.675, 91204.335, -91204.335, 0.125, -0.125,
    0.00005, -0.00005, 1.0057, 1e12 + 0.5, -(1e12 + 0.5), 1e-9,
    12345.67885, -12345.67885, 0.49999999999999994, 2.5, 3.5, -2.5,
]


def test_round_half_up_bitwise_matches_duckdb(spark):
    """SURVEY §7.5.1: the one rounding policy, bit-identical across
    engines, at both scales used by the pipeline (2 and 4)."""
    df = spark.createDataFrame([(v,) for v in _HARD_VALUES], ["x"])
    got = df.select(
        round_half_up(F.col("x"), 2).alias("r2"),
        round_half_up(F.col("x"), 4).alias("r4"),
    ).collect()
    con = duckdb.connect()
    for (v, row) in zip(_HARD_VALUES, got):
        want2, want4 = con.execute(
            f"SELECT {sql_round('x', 2)}, {sql_round('x', 4)} FROM (SELECT CAST({v!r} AS DOUBLE) AS x)"
        ).fetchone()
        # repr-level equality: the driver's value hash distinguishes
        # -0.0 from 0.0, so sign bits must agree too.
        assert repr(row.r2) == repr(want2), (v, row.r2, want2)
        assert repr(row.r4) == repr(want4), (v, row.r4, want4)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.integers(min_value=1, max_value=50),
            st.floats(min_value=0.01, max_value=1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_lag_metrics_property(spark, rows):
    """W1/W2 invariants on arbitrary frames: partition-first row is
    exactly 0 (not NULL); every other row equals the per-symbol diff
    computed independently in Python."""
    df = spark.createDataFrame(rows, ["Symbol", "Date", "Close"])
    got = {
        (r.Symbol, r.Date): (r.Close_Change, r.Close_Pct_Change)
        for r in stock_metrics(df).collect()
    }
    by_symbol: dict[str, list] = {}
    for s, d, c in rows:
        by_symbol.setdefault(s, []).append((d, c))
    for s, series in by_symbol.items():
        series.sort()
        prev = None
        for d, c in series:
            change, pct = got[(s, d)]
            if prev is None:
                assert change == 0.0 and pct == 0.0
            else:
                p = 10000.0
                want_change = math.copysign(1, c - prev) * math.floor(abs(c - prev) * p + 0.5) / p
                assert change == want_change, (s, d, change, want_change)
            prev = c


def test_prefix_jaccard_threshold_validation(spark):
    """Thresholds that per-mille arithmetic can't represent exactly are
    rejected up front, not silently mis-rounded."""
    import pytest

    from sp500_stock_etl_spark.operators.dedup import prefix_jaccard_pairs

    df = spark.createDataFrame([("d1", "a b c d")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="3 decimal"):
        prefix_jaccard_pairs(df, "doc_id", "text", threshold=1 / 3)


def test_prefix_len_integer_ceil_exact(spark):
    """The prefix length must use exact integer ceil(t*n): IEEE float
    ceil overshoots at e.g. t=0.56, n=25 (float ceil 15, true 14),
    silently shortening the prefix by one."""
    import math

    for t_millis in (140, 280, 560, 600, 500):
        got = {
            r["n"]: r["c"]
            for r in spark.range(1, 101)
            .selectExpr(
                "CAST(id AS INT) AS n",
                f"CAST((id * {t_millis} + 999) DIV 1000 AS INT) AS c",
            )
            .collect()
        }
        for n in range(1, 101):
            true_ceil = -((-n * t_millis) // 1000)
            assert got[n] == true_ceil, (t_millis, n)
            assert true_ceil >= math.floor(t_millis / 1000 * n)
