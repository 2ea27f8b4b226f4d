"""Custom Python Data Source (sources/quote_feed): filter pushdown
prunes days inside the source and whole symbol partitions before they
are scheduled; pushed plans return exactly what a post-scan filter
would."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from sp500_stock_etl_spark.sources.quote_feed import (
    QuoteFeedReader,
    register,
)


def _reader(**opts) -> QuoteFeedReader:
    defaults = {"symbols": "40", "days": "20", "symbols_per_partition": "10"}
    defaults.update({k: str(v) for k, v in opts.items()})
    return QuoteFeedReader(defaults)


def test_symbol_filter_prunes_partitions():
    from pyspark.sql.datasource import EqualTo

    r = _reader()
    unsupported = list(r.pushFilters([EqualTo(("symbol",), "S0035")]))
    assert unsupported == []
    parts = r.partitions()
    assert len(parts) == 1, "only the batch containing S0035 survives"
    assert parts[0].first == 30 and parts[0].last == 39
    rows = list(r.read(parts[0]))
    assert {row[1] for row in rows} == {"S0035"}


def test_date_filters_bound_generation():
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    r = _reader()
    list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("trade_date",), date(2020, 1, 5)),
                LessThan(("trade_date",), date(2020, 1, 8)),
            ]
        )
    )
    parts = r.partitions()
    rows = list(r.read(parts[0]))
    days = {row[0] for row in rows}
    assert days == {date(2020, 1, 5), date(2020, 1, 6), date(2020, 1, 7)}


def test_unsupported_filters_returned():
    from pyspark.sql.datasource import GreaterThan

    r = _reader()
    leftover = list(r.pushFilters([GreaterThan(("close",), 10.0)]))
    assert len(leftover) == 1, "non-prunable filters go back to Spark"


def test_foreign_symbol_literal_matches_nothing():
    """symbol = 'AAPL' (never generated) must yield an empty relation,
    not a ValueError mid-scan; a mixed IN list keeps the parseable
    members."""
    from pyspark.sql.datasource import EqualTo, In

    r = _reader()
    assert list(r.pushFilters([EqualTo(("symbol",), "AAPL")])) == []
    parts = r.partitions()
    assert sum(len(list(r.read(p))) for p in parts) == 0

    r2 = _reader()
    assert list(r2.pushFilters([In(("symbol",), ("AAPL", "S0007"))])) == []
    rows = [row for p in r2.partitions() for row in r2.read(p)]
    assert {row[1] for row in rows} == {"S0007"}


def test_pushed_equals_post_filtered(spark):
    register(spark)
    base = (
        spark.read.format("quote_feed")
        .option("symbols", "30")
        .option("days", "10")
        .load()
    )
    pushed = base.where(
        (F.col("trade_date") >= "2020-01-03")
        & (F.col("trade_date") <= "2020-01-06")
        & F.col("symbol").isin("S0002", "S0017")
    )
    everything = {tuple(r) for r in base.collect()}
    kept = {
        t
        for t in everything
        if date(2020, 1, 3) <= t[0] <= date(2020, 1, 6)
        and t[1] in ("S0002", "S0017")
    }
    assert {tuple(r) for r in pushed.collect()} == kept
    assert len(kept) == 8


def test_stream_reader_offsets_and_replay():
    """Offsets advance one day-batch at a time; replay between
    committed offsets regenerates identical rows (exactly-once)."""
    from sp500_stock_etl_spark.sources.quote_feed import QuoteFeedStreamReader

    r = QuoteFeedStreamReader({"symbols": "5", "days": "3", "days_per_batch": "1"})
    off = r.initialOffset()
    seen = []
    for _ in range(4):  # one more trigger than there is data
        rows, off2 = r.read(off)
        seen.append((off, off2, list(rows)))
        off = off2
    assert [s[1]["day"] for s in seen] == [1, 2, 3, 3]
    assert all(len(s[2]) == 5 for s in seen[:3])
    assert seen[3][2] == [], "drained stream yields empty batches"
    replay = list(r.readBetweenOffsets({"day": 1}, {"day": 2}))
    assert replay == seen[1][2], "replay must be deterministic"


# --- r8: source-level column pruning via the `columns` option -------------
# (The Python Data Source API has no pruneColumns callback as of
# Spark 4.1 — the projection travels as an explicit reader option,
# the REST-source idiom; sources/quote_feed.py::_projected_columns.)


def test_columns_option_narrows_reader_schema(spark):
    from sp500_stock_etl_spark.sources.quote_feed import (
        register as register_source,
    )

    register_source(spark)
    narrow = (
        spark.read.format("quote_feed")
        .option("symbols", "10")
        .option("days", "5")
        .option("columns", "close,trade_date")
        .load()
    )
    # Plan-level: the SCAN's own output schema is the narrow one
    # (field order follows the full schema, not the option order) —
    # no Project over a wide scan.
    assert narrow.schema.simpleString() == "struct<trade_date:date,close:double>"
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "open" not in plan and "volume" not in plan, plan

    full = (
        spark.read.format("quote_feed")
        .option("symbols", "10")
        .option("days", "5")
        .load()
    )
    got = {(r.trade_date, r.close) for r in narrow.collect()}
    want = {
        (r.trade_date, r.close)
        for r in full.select("trade_date", "close").collect()
    }
    assert got == want and len(got) == 50


def test_columns_option_unknown_name_fails_at_planning():
    from sp500_stock_etl_spark.sources.quote_feed import _projected_columns

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown columns"):
        _projected_columns({"columns": "close,nope"})
    # order-insensitive, whitespace-tolerant, full-schema field order
    assert _projected_columns({"columns": " volume , symbol "}) == (
        "symbol",
        "volume",
    )
    assert _projected_columns({}) == (
        "trade_date", "symbol", "open", "high", "low", "close", "volume",
    )


def test_columns_option_composes_with_filter_pushdown(spark):
    from sp500_stock_etl_spark.sources.quote_feed import (
        register as register_source,
    )

    register_source(spark)
    import pyspark.sql.functions as F

    df = (
        spark.read.format("quote_feed")
        .option("symbols", "10")
        .option("days", "10")
        .option("columns", "trade_date,symbol,close")
        .load()
        .where(F.col("symbol") == "S0003")
        .where(F.col("trade_date") >= F.lit("2020-01-05").cast("date"))
    )
    rows = df.collect()
    assert len(rows) == 6  # days 4..9 of symbol 3
    assert all(r.symbol == "S0003" for r in rows)
