"""Custom quote-feed source via Spark 4's Python Data Source API —
the idiomatic rebuild of the reference's per-symbol REST ingestion
(S2, dags/sp500_dag.py.py:95-109): the sequential yfinance loop
becomes a PARTITIONED source (one input partition per symbol batch,
each fetched by its own task) with the fetch window (:102-103) pushed
down as real source-level filter pruning.

This is the custom-source candidate SURVEY §4.2 names. The "feed" is
a deterministic synthetic generator (the sandbox has no network), in
pure integer arithmetic so a SQL oracle reproduces it exactly — but
the SOURCE MACHINERY is real: schema declaration, partition planning,
``pushFilters`` (date range prunes the generated days; symbol
equality/IN prunes whole partitions), and per-partition iteration are
exactly what a production REST/JDBC-backed Python data source runs.

Scale notes: partition count = symbols / symbols_per_partition, so
ingest parallelism is a knob, not a loop; pushed date filters bound
each task's work BEFORE generation (at 100 TB: before the HTTP call);
everything the source cannot handle is returned to Spark untouched.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_EPOCH = date(2020, 1, 1)

QUOTE_FEED_SCHEMA = (
    "trade_date DATE, symbol STRING, open DOUBLE, high DOUBLE, "
    "low DOUBLE, close DOUBLE, volume BIGINT"
)

_ALL_COLUMNS = ("trade_date", "symbol", "open", "high", "low", "close", "volume")


def _projected_columns(options: dict) -> tuple[str, ...]:
    """Source-level column pruning (r8, r7 verdict item 8).

    The Python Data Source API (as of Spark 4.1) exposes
    ``pushFilters`` but no ``pruneColumns`` callback, so Catalyst
    cannot push a projection into a Python source on its own. The
    source therefore accepts the projection EXPLICITLY via a
    ``columns`` option — exactly what a production REST/JDBC-backed
    source does (request only the needed fields); ``schema()``
    narrows accordingly, so the scan never materializes, serializes,
    or Arrow-ships the dropped columns. Field order follows the full
    schema regardless of option order; unknown names fail fast at
    planning time.
    """
    raw = options.get("columns")
    if not raw:
        return _ALL_COLUMNS
    want = [c.strip() for c in str(raw).split(",") if c.strip()]
    unknown = sorted(set(want) - set(_ALL_COLUMNS))
    if unknown:
        raise ValueError(
            f"quote_feed: unknown columns {unknown}; valid: {_ALL_COLUMNS}"
        )
    return tuple(c for c in _ALL_COLUMNS if c in set(want))


def _quote_row(i: int, j: int) -> tuple:
    """Deterministic bar for symbol index i on day offset j — pure
    integer arithmetic + /100.0, so DuckDB reproduces it bitwise."""
    base = (i * 31 + j * 7) % 5000
    close = (1000 + base * 3) / 100.0
    open_ = (1000 + ((base + 11) % 5000) * 3) / 100.0
    spread = (base % 200) / 100.0
    high = max(open_, close) + spread
    low = min(open_, close) - spread
    volume = 10_000 + (i * 97 + j * 13) % 90_000
    return (
        _EPOCH + timedelta(days=j),
        f"S{i:04d}",
        open_,
        high,
        low,
        close,
        volume,
    )


@dataclass
class _SymbolBatch(InputPartition):
    first: int  # first symbol index (inclusive)
    last: int  # last symbol index (inclusive)
    day_lo: int  # first day offset (inclusive)
    day_hi: int  # last day offset (inclusive)


class QuoteFeedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_symbols = int(options.get("symbols", "100"))
        self.n_days = int(options.get("days", "30"))
        self.per_partition = int(options.get("symbols_per_partition", "25"))
        # Source-level projection: indexes into the full generated row
        # (None when every column is kept — zero-copy fast path).
        cols = _projected_columns(options)
        self.col_idx = (
            None
            if cols == _ALL_COLUMNS
            else tuple(_ALL_COLUMNS.index(c) for c in cols)
        )
        # Filter-derived pruning state (day offsets / symbol indexes).
        self.day_lo = 0
        self.day_hi = self.n_days - 1
        self.symbols: set[int] | None = None

    def _day(self, value) -> int:
        return (value - _EPOCH).days

    @staticmethod
    def _sym_index(value) -> int | None:
        """Parse an 'S<digits>' symbol literal to its index, or None for
        any foreign ticker (e.g. 'AAPL') — which this source never emits,
        so it matches nothing rather than raising mid-scan."""
        m = re.fullmatch(r"S(\d+)", str(value))
        return int(m.group(1)) if m else None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Date-range and symbol filters prune at the source — the
        fetch-window pushdown of dags/sp500_dag.py.py:102-103. Anything
        else is yielded back for Spark to evaluate."""
        for f in filters:
            col = f.attribute[0] if f.attribute else None
            if col == "trade_date" and isinstance(f, GreaterThanOrEqual):
                self.day_lo = max(self.day_lo, self._day(f.value))
            elif col == "trade_date" and isinstance(f, GreaterThan):
                self.day_lo = max(self.day_lo, self._day(f.value) + 1)
            elif col == "trade_date" and isinstance(f, LessThanOrEqual):
                self.day_hi = min(self.day_hi, self._day(f.value))
            elif col == "trade_date" and isinstance(f, LessThan):
                self.day_hi = min(self.day_hi, self._day(f.value) - 1)
            elif col == "trade_date" and isinstance(f, EqualTo):
                d = self._day(f.value)
                self.day_lo, self.day_hi = max(self.day_lo, d), min(self.day_hi, d)
            elif col == "symbol" and isinstance(f, (EqualTo, In)):
                vals = f.value if isinstance(f, In) else (f.value,)
                # Unparseable literals match nothing (never generated);
                # an empty `want` legitimately prunes every partition.
                want = {
                    s
                    for s in (self._sym_index(v) for v in vals)
                    if s is not None
                }
                self.symbols = want if self.symbols is None else self.symbols & want
            else:
                yield f  # unsupported → Spark evaluates it post-scan

    def partitions(self) -> list[_SymbolBatch]:
        """One partition per symbol batch whose symbols survive the
        pushed filters — pruned partitions are never scheduled."""
        parts = []
        for first in range(0, self.n_symbols, self.per_partition):
            last = min(first + self.per_partition, self.n_symbols) - 1
            if self.symbols is not None and not any(
                first <= s <= last for s in self.symbols
            ):
                continue  # whole batch pruned
            if self.day_lo <= self.day_hi:
                parts.append(_SymbolBatch(first, last, self.day_lo, self.day_hi))
        return parts or [_SymbolBatch(0, -1, 0, -1)]  # empty relation

    def read(self, part: _SymbolBatch) -> Iterator[tuple]:
        idx = self.col_idx
        for i in range(part.first, part.last + 1):
            if self.symbols is not None and i not in self.symbols:
                continue
            for j in range(part.day_lo, part.day_hi + 1):
                row = _quote_row(i, j)
                yield row if idx is None else tuple(row[k] for k in idx)


class QuoteFeedStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch twin of the batch reader: the reference's DAILY
    schedule (dags/sp500_dag.py.py:324) as streaming offsets — each
    micro-batch delivers ``days_per_batch`` trading days for every
    symbol, the offset is the next unread day, and replay between
    committed offsets is pure re-generation (deterministic source =
    free exactly-once; a REST-backed version would re-fetch the same
    date range, which is the reference's own retry semantics).

    Under ``trigger(availableNow=True)`` the stream drains every
    generated day and stops — so the result equals the batch scan and
    the batch SQL oracle checks the streaming source end-to-end.
    """

    def __init__(self, options: dict):
        self.n_symbols = int(options.get("symbols", "100"))
        self.n_days = int(options.get("days", "30"))
        self.days_per_batch = int(options.get("days_per_batch", "1"))
        # Same source-level projection contract as the batch reader.
        cols = _projected_columns(options)
        self.col_idx = (
            None
            if cols == _ALL_COLUMNS
            else tuple(_ALL_COLUMNS.index(c) for c in cols)
        )

    def initialOffset(self) -> dict:
        return {"day": 0}

    def read(self, start: dict) -> tuple:
        lo = start["day"]
        hi = min(lo + self.days_per_batch, self.n_days)
        # A list_iterator, not a bare generator: Spark's prefetch
        # cache copy.copy()s the returned iterator for replay, which a
        # generator does not support (and it calls next() on it, which
        # a bare list does not).
        rows = list(self.readBetweenOffsets(start, {"day": hi}))
        return iter(rows), {"day": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        idx = self.col_idx
        for j in range(start["day"], end["day"]):
            for i in range(self.n_symbols):
                row = _quote_row(i, j)
                yield row if idx is None else tuple(row[k] for k in idx)


class QuoteFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "quote_feed"

    def schema(self) -> str | StructType:
        cols = _projected_columns(self.options)
        if cols == _ALL_COLUMNS:
            return QUOTE_FEED_SCHEMA
        by_name = dict(
            part.strip().split(" ", 1)
            for part in QUOTE_FEED_SCHEMA.split(", ")
        )
        return ", ".join(f"{c} {by_name[c]}" for c in cols)

    def reader(self, schema: StructType) -> QuoteFeedReader:
        return QuoteFeedReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> QuoteFeedStreamReader:
        return QuoteFeedStreamReader(self.options)


def register(spark) -> None:
    # The streaming source's prefetch runner is a separate driver-side
    # Python process that does NOT see sc.addPyFile additions, so the
    # reader classes must travel self-contained: register this module
    # for cloudpickle by-VALUE serialization (classes are otherwise
    # pickled by reference and the runner cannot import the package).
    import sys

    this_module = sys.modules[__name__]
    for cp_name in ("pyspark.cloudpickle", "cloudpickle"):
        # Spark serializes with its VENDORED pyspark.cloudpickle;
        # register with the standalone package too for completeness.
        try:
            import importlib

            cp = importlib.import_module(cp_name)
            cp.register_pickle_by_value(this_module)
        except Exception:
            pass  # old cloudpickle: batch source still works via addPyFile
    spark.dataSource.register(QuoteFeedDataSource)
