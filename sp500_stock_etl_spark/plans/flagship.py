"""The flagship pipeline: the reference's analytics kernel, re-expressed
as one lazy DataFrame plan (SURVEY.md §7.1 step 2).

Reference flow (dags/sp500_dag.py.py:95-216, per-symbol loop then
concat/sort): fetch → normalize schema → derive lag metrics → cast +
round → drop null essentials → project → union → global sort.

Spark flow: one expression tree over the lineitem fact table shaped as
quotes (io.readers.stock_data_from_lineitem). Catalyst plans it as:
parquet scan (pruned to 8 columns) → single hash exchange on symbol →
Window (lag) → project/round → range exchange (global sort). Two
shuffles total; the per-symbol loop, the /tmp CSV, the XCom hops all
disappear into lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.rounding import round_half_up
from ..io.readers import load_table, stock_data_from_lineitem
from ..operators.window_metrics import with_lag_metrics

ORDER_TIEBREAK = ["trade_date", "order_key", "line_number"]


def flagship_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → project → cast/round → window lag metrics → null-drop →
    final projection → global sort.

    Column-for-column parity with the reference's derived schema
    (dags/sp500_dag.py.py:161-167, 175-180, 186, 189-194, 216):
      close_change      ≈ Close_Change   (diff, first-row 0, round 4)
      close_pct_change  ≈ Close_Pct_Change (pct*100, first-row 0, round 4)
      daily_range       ≈ Daily_Range    (high-low, round 4)
      daily_range_pct   ≈ Daily_Range_Pct ((high-low)/low*100, fillna 0, round 4)
    """
    quotes = stock_data_from_lineitem(load_table(spark, sf_dir, "lineitem"))

    with_metrics = with_lag_metrics(
        quotes, "symbol", ORDER_TIEBREAK, "close",
        change_col="close_change", pct_change_col="close_pct_change",
    )

    high, low = F.col("high"), F.col("low")
    derived = with_metrics.withColumns(
        {
            "daily_range": round_half_up(high - low, 4),
            # pandas fillna(0) covers the NaN from a null/zero Low
            # (dags/sp500_dag.py.py:167); try_divide + coalesce is the
            # ANSI-safe equivalent.
            "daily_range_pct": round_half_up(
                F.coalesce(F.try_divide(high - low, low) * 100.0, F.lit(0.0)), 4
            ),
        }
    )

    return (
        derived
        # P6: essential-field filter (dags/sp500_dag.py.py:186)
        .na.drop(subset=["trade_date", "symbol", "close"])
        # P7 + D7: final projection, fixed order, price rounding
        .select(
            "trade_date",
            "symbol",
            round_half_up(F.col("close"), 2).alias("close"),
            round_half_up(F.col("high"), 2).alias("high"),
            round_half_up(F.col("low"), 2).alias("low"),
            F.col("volume").cast("double").alias("volume"),
            "close_change",
            "close_pct_change",
            "daily_range",
            "daily_range_pct",
        )
        # O1: global multi-key sort (dags/sp500_dag.py.py:216)
        .orderBy("trade_date", "symbol")
    )
