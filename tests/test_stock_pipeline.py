"""Golden replay (SURVEY.md §5.2.3): run the reference's own sample
output through the engine's cleansing reader + analytics kernel and
assert the derived columns recompute to the stored values, plus CSV
round-trip semantics and the window-trap cases (§5.2.4)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sp500_stock_etl_spark.io.readers import read_stock_csv
from sp500_stock_etl_spark.io.writers import write_quoted_csv
from sp500_stock_etl_spark.plans import stock_pipeline as SP

GOLDEN = "/root/reference/data/2025-10-22T17-10.csv"

needs_golden = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference golden sample not present"
)


@needs_golden
def test_golden_replay_derived_columns(spark):
    raw = read_stock_csv(spark, GOLDEN)
    quotes = SP.normalize_quotes(raw.drop("_c0"))
    recomputed = SP.stock_metrics(
        quotes.select("Date", "Symbol", "Open", "High", "Low", "Close", "Volume")
    )
    stored = SP.normalize_quotes(raw.drop("_c0")).select(
        "Date", "Symbol",
        F.col("Close_Change").cast("double").alias("want_change"),
        F.col("Close_Pct_Change").cast("double").alias("want_pct"),
        F.col("Daily_Range").cast("double").alias("want_range"),
        F.col("Daily_Range_Pct").cast("double").alias("want_range_pct"),
    )
    joined = recomputed.join(stored, ["Date", "Symbol"]).collect()
    assert len(joined) == 994  # 497 symbols x 2 dates
    # The reference derives these from UNROUNDED prices, then rounds
    # prices to 2dp for the CSV (dags/sp500_dag.py.py:161-180). We only
    # have the 2dp prices, so each input carries ±0.005 rounding error;
    # bound each column by its propagated error (+ banker's-vs-half-up
    # slack in the 4th decimal, SURVEY.md §7.5.1).
    for r in joined:
        assert abs(r.Close_Change - r.want_change) <= 1.02e-2, r
        assert abs(r.Daily_Range - r.want_range) <= 1.02e-2, r
        prev_close = r.Close - r.want_change  # reconstruct lagged close
        pct_tol = 1e-3 + (1.02 / prev_close if prev_close > 0.01 else 1.0)
        assert abs(r.Close_Pct_Change - r.want_pct) <= pct_tol, r
        range_tol = 1e-3 + (1.12 / r.Low if r.Low > 0.01 else 1.0)
        assert abs(r.Daily_Range_Pct - r.want_range_pct) <= range_tol, r


@needs_golden
def test_golden_first_date_rows_are_zero(spark):
    """Partition-first-row semantics (SURVEY.md §1.5): every row of the
    first fetched date has CLOSE_CHANGE=0, CLOSE_PCT_CHANGE=0."""
    raw = SP.normalize_quotes(read_stock_csv(spark, GOLDEN).drop("_c0"))
    first = raw.agg(F.min("Date")).collect()[0][0]
    rows = raw.where(F.col("Date") == first).select(
        "Close_Change", "Close_Pct_Change"
    ).collect()
    assert rows and all(r.Close_Change == 0.0 and r.Close_Pct_Change == 0.0 for r in rows)


def test_symbol_validation_matches_reference_rules(spark):
    cand = spark.createDataFrame(
        [("AAPL",), ("BRK.B",), ("BF-B",), (" T ",), ("",), (None,),
         ("TOOLONG",), ("BAD$",), ("ÄBC",)],
        ["Symbol"],
    )
    got = {r.Symbol for r in SP.validate_symbols(cand).collect()}
    # len<=5, alnum after stripping ./-, ASCII pinned (SURVEY §2.3 P4)
    assert got == {"AAPL", "BRK.B", "BF-B", "T"}


def test_null_if_multi_token_and_quoted_roundtrip(spark, tmp_path):
    """S3 NULL_IF semantics + K1 writer contract (SURVEY §2.1/2.2)."""
    src = tmp_path / "in.csv"
    src.write_text(
        'Symbol,Close,Note\n'
        '"A","1.5","ok"\n'
        '"B","NULL","null"\n'
        '"C","","\\N"\n'
        '" D ","2.25","x"\n'
    )
    df = read_stock_csv(spark, str(src))
    rows = {r.Symbol: (r.Close, r.Note) for r in df.collect()}
    assert rows["B"] == (None, None)
    assert rows["C"] == (None, None)
    assert "D" in rows, "TRIM_SPACE semantics"
    assert rows["D"][0] == "2.25"

    out = tmp_path / "out"
    write_quoted_csv(df.select("Symbol", F.col("Close").cast("double").alias("Close")), str(out))
    import glob

    text = open(glob.glob(str(out / "part-*.csv"))[0]).read()
    assert '"A","1.5000"' in text.replace("\r", "")
    assert '"B",""' in text, "NULL written as empty, quoted-all"


def test_window_first_row_zero_and_partition_isolation(spark):
    df = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 2, 12.0), ("B", 1, 100.0), ("B", 2, 90.0)],
        ["Symbol", "seq", "Close"],
    ).withColumn("Date", F.col("seq"))
    out = {
        (r.Symbol, r.Date): (r.Close_Change, r.Close_Pct_Change)
        for r in SP.stock_metrics(df).collect()
    }
    assert out[("A", 1)] == (0.0, 0.0), "first row coerced to 0, not NULL"
    assert out[("B", 1)] == (0.0, 0.0), "partition isolation: B unaffected by A"
    assert out[("A", 2)] == (2.0, 20.0)
    assert out[("B", 2)] == (-10.0, -10.0)
