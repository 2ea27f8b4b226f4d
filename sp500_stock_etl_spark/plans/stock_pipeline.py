"""The reference ETL pipeline end-to-end on stock-shaped data — the
"switch path" for a reference user: same inputs (quoted CSV of OHLCV
bars + a symbol dimension), same outputs (STOCK_DATA rows + QA
summary + fully-quoted CSV), one Spark job instead of four Airflow
tasks (SURVEY.md §3.1).

Stage map (reference → here):
  extract_symbols (dags/sp500_dag.py.py:26-85)  → validate_symbols()
  get_stock_data   (:88-255)                    → normalize_quotes() + stock_metrics()
  save/upload      (:258-304)                   → io.writers.write_quoted_csv (s3a path subsumes upload)
  load_to_snowflake(:348-388)                   → io.writers.write_partitioned_table + qa_summary
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.cleaning import valid_symbol
from ..functions.rounding import round_half_up
from ..operators.aggregates import qa_summary
from ..operators.window_metrics import lag_change, lag_pct_change, symbol_window

# D3: the reference's column-name normalization map
# (dags/sp500_dag.py.py:141-155), extended with the golden sample's
# uppercase header (data/2025-10-22T17-10.csv predates the DAG's
# formatting — FIXTURES.md §B).
RENAME_MAP = {
    "Adj Close": "Adj_Close",
    "AdjClose": "Adj_Close",
    "DATE": "Date",
    "SYMBOL": "Symbol",
    "OPEN": "Open",
    "HIGH": "High",
    "LOW": "Low",
    "CLOSE": "Close",
    "VOLUME": "Volume",
    "CLOSE_CHANGE": "Close_Change",
    "CLOSE_PCT_CHANGE": "Close_Pct_Change",
    "DAILY_RANGE": "Daily_Range",
    "DAILY_RANGE_PCT": "Daily_Range_Pct",
}

FINAL_COLUMNS = [
    "Date", "Symbol", "Open", "High", "Low", "Close", "Volume",
    "Close_Change", "Close_Pct_Change", "Daily_Range", "Daily_Range_Pct",
]


def validate_symbols(df: DataFrame, col: str = "Symbol") -> DataFrame:
    """The extract_symbols cleaning chain (dags/sp500_dag.py.py:51-60):
    project → trim → drop null/empty → validity predicate."""
    trimmed = df.select(F.trim(F.col(col)).alias(col))
    return trimmed.where(valid_symbol(F.col(col))).distinct()


def normalize_quotes(raw: DataFrame, date_formats: tuple[str, ...] = ("M/d/yyyy", "yyyy-MM-dd")) -> DataFrame:
    """Schema normalization (D1/D3/D6): rename map, lossy numeric casts
    (null on failure, like pd.to_numeric(errors='coerce')), multi-format
    date parse (the golden sample uses M/D/YYYY; the DAG writes
    yyyy-MM-dd)."""
    df = raw
    for old, new in RENAME_MAP.items():
        if old in df.columns and new not in df.columns:
            df = df.withColumnRenamed(old, new)
    parsed_date = F.coalesce(
        *[F.try_to_timestamp(F.col("Date"), F.lit(fmt)).cast("date") for fmt in date_formats]
    )
    df = df.withColumn("Date", parsed_date)
    # D6: lossy cast over all 9 numeric columns (dags/sp500_dag.py.py:169-175),
    # derived ones included — the golden sample carries them pre-computed.
    for c in ("Open", "High", "Low", "Close",
              "Close_Change", "Close_Pct_Change", "Daily_Range", "Daily_Range_Pct"):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast("double"))
    if "Volume" in df.columns:
        df = df.withColumn("Volume", F.col("Volume").cast("double").cast("long"))
    return df


def stock_metrics(quotes: DataFrame) -> DataFrame:
    """The analytics kernel (dags/sp500_dag.py.py:160-194): lag metrics
    with partition-first-row→0, range metrics, rounding policy (derived
    → 4, prices → 2), essential-field drop, fixed projection, sort."""
    w = symbol_window("Symbol", ["Date"])
    close, high, low = F.col("Close"), F.col("High"), F.col("Low")
    new_cols = {
        "Close_Change": round_half_up(lag_change(close, w), 4),
        "Close_Pct_Change": round_half_up(lag_pct_change(close, w), 4),
    }
    # Range metrics only when the inputs exist — the reference projects
    # "columns that exist and have data" (dags/sp500_dag.py.py:192-194).
    if "High" in quotes.columns and "Low" in quotes.columns:
        new_cols["Daily_Range"] = round_half_up(high - low, 4)
        new_cols["Daily_Range_Pct"] = round_half_up(
            F.coalesce(F.try_divide(high - low, low) * 100.0, F.lit(0.0)), 4
        )
    derived = quotes.withColumns(new_cols)
    present = [c for c in FINAL_COLUMNS if c in derived.columns]
    return (
        derived.na.drop(subset=["Date", "Symbol", "Close"])
        .select(*present)
        .orderBy("Date", "Symbol")
    )


def quality_report(stock: DataFrame) -> DataFrame:
    """The QA summary printed per run (dags/sp500_dag.py.py:219-227)
    and verified in-warehouse (:381-386, sans its trailing-comma bug)."""
    return qa_summary(stock, "Symbol", "Date", FINAL_COLUMNS[:7])
