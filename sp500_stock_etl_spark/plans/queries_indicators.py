"""Technical-indicator suite over the stock view — the analytics a
user of an S&P-500 ETL actually runs downstream of the reference DAG
(dags/sp500_dag.py.py computes prev_close/pct_change at :161-176 and
stops there; Bollinger bands, RSI, EWMA smoothing and drawdown are
the canonical next layer of that pipeline).

Stock view convention (shared with rolling_avg_sma7 /
sma_crossover_signals): symbol = l_partkey, trade_date =
date(l_shipdate), close = l_extendedprice, deterministic row order
(trade_date, order_key, line_number). Prices enter integer CENTS via
``CAST(floor(close * 100) AS BIGINT)`` — both engines floor the same
IEEE double, so every downstream comparison is exact integer
arithmetic with zero float-order dependence.

Scale design (100 TB):
- Bollinger / RSI / drawdown are single-pass window functions over a
  ``PARTITION BY symbol`` sort — ONE shuffle keyed by symbol, then
  frame-local arithmetic; the per-symbol group-to-scalar reduction
  reuses the same partitioning (no second shuffle under AQE).
- Band/threshold predicates are cross-multiplied into pure BIGINT
  comparisons (e.g. ``(c*n - s)^2 > k^2 * (n*q - s^2)``) so no sqrt
  or float division ever enters a filter — survivor sets are
  deterministic across engines and partitionings. Magnitude bound:
  cents <= ~1.1e7, so every intermediate stays < 2e17 << 2^63.
- The EWMA fold is the one inherently-sequential recurrence; it runs
  as a pure Catalyst ``aggregate()`` HOF over a per-symbol
  ``array_sort(collect_list(struct(...)))`` — JVM codegen, no Python
  boundary — bounded by the per-symbol series length (trading days,
  ~10^4 worst case), never by corpus size. Same boundedness argument
  as the BPE-encode fold (queries_r6) and the ADPCM state walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io.readers import load_table
from .registry import register

# Shared stock-view SQL prefix (oracle side). Engine side builds the
# identical frame with the DataFrame API.
_STOCK_CTE = """
stock AS (
    SELECT l_partkey AS symbol,
           CAST(l_shipdate AS DATE) AS trade_date,
           l_orderkey AS order_key,
           l_linenumber AS line_number,
           CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem
)
"""


def _stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_partkey").alias("symbol"),
        F.to_date("l_shipdate").alias("trade_date"),
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )


# ---------------------------------------------------------------------------
# Bollinger bands (20-period, k=2), exact-integer band breaks.
# mean = s/n, sigma^2 = (n*q - s^2)/n^2 over the 20-row frame; a close
# outside mean +/- 2*sigma is detected WITHOUT sqrt by comparing
# (c*n - s)^2 against 4*(n*q - s^2) — all BIGINT, all exact.
# ---------------------------------------------------------------------------

_BOLLINGER_ORACLE = f"""
WITH {_STOCK_CTE},
framed AS (
    SELECT symbol, cents,
           count(*) OVER w AS n,
           sum(cents) OVER w AS s,
           sum(cents * cents) OVER w AS q
    FROM stock
    WINDOW w AS (
        PARTITION BY symbol ORDER BY trade_date, order_key, line_number
        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
    )
),
flagged AS (
    SELECT symbol, s,
           CASE WHEN (cents * n - s) > 0
                 AND (cents * n - s) * (cents * n - s) > 4 * (n * q - s * s)
                THEN 1 ELSE 0 END AS up_break,
           CASE WHEN (cents * n - s) < 0
                 AND (cents * n - s) * (cents * n - s) > 4 * (n * q - s * s)
                THEN 1 ELSE 0 END AS down_break
    FROM framed
    WHERE n = 20
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_full_windows,
       CAST(sum(up_break) AS BIGINT) AS n_upper_breaks,
       CAST(sum(down_break) AS BIGINT) AS n_lower_breaks,
       CAST(sum(s) AS BIGINT) AS frame_sum_checksum
FROM flagged
GROUP BY symbol
"""


@register(
    "indicator_bollinger_bands",
    _BOLLINGER_ORACLE,
    doc="Bollinger 20/2 band breaks in exact BIGINT arithmetic — "
    "sqrt-free cross-multiplied band test, one symbol-keyed shuffle, "
    "frame-local window math (r8 indicators suite)",
)
def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    st = _stock(spark, sf_dir)
    w = (
        Window.partitionBy("symbol")
        .orderBy("trade_date", "order_key", "line_number")
        .rowsBetween(-19, Window.currentRow)
    )
    c = F.col("cents")
    framed = st.select(
        "symbol",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cents").over(w).alias("s"),
        F.sum(c * c).over(w).alias("q"),
    ).where(F.col("n") == 20)
    dev = c * F.col("n") - F.col("s")
    var4 = 4 * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    flagged = framed.select(
        "symbol",
        "s",
        F.when((dev > 0) & (dev * dev > var4), 1).otherwise(0).alias("up_break"),
        F.when((dev < 0) & (dev * dev > var4), 1).otherwise(0).alias("down_break"),
    )
    return flagged.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_full_windows"),
        F.sum("up_break").alias("n_upper_breaks"),
        F.sum("down_break").alias("n_lower_breaks"),
        F.sum("s").alias("frame_sum_checksum"),
    )


# ---------------------------------------------------------------------------
# Cutler's RSI (14-period, SMA smoothing — the EWMA-free variant, so
# the whole indicator is window arithmetic). RSI = 100*G/(G+L) never
# materializes as a float: overbought (RSI>70) is 10*G > 7*(G+L),
# oversold (RSI<30) is 10*G < 3*(G+L) — exact BIGINT cross-products.
# ---------------------------------------------------------------------------

_RSI_ORACLE = f"""
WITH {_STOCK_CTE},
diffed AS (
    SELECT symbol, trade_date, order_key, line_number,
           cents - lag(cents) OVER (
               PARTITION BY symbol
               ORDER BY trade_date, order_key, line_number
           ) AS d
    FROM stock
),
framed AS (
    SELECT symbol,
           count(d) OVER f AS nd,
           sum(CASE WHEN d > 0 THEN d ELSE 0 END) OVER f AS g,
           sum(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER f AS l
    FROM diffed
    WINDOW f AS (
        PARTITION BY symbol ORDER BY trade_date, order_key, line_number
        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW
    )
),
flagged AS (
    SELECT symbol, g, l,
           CASE WHEN 10 * g > 7 * (g + l) THEN 1 ELSE 0 END AS overbought,
           CASE WHEN 10 * g < 3 * (g + l) THEN 1 ELSE 0 END AS oversold
    FROM framed
    WHERE nd = 14 AND g + l > 0
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_signals,
       CAST(sum(overbought) AS BIGINT) AS n_overbought,
       CAST(sum(oversold) AS BIGINT) AS n_oversold,
       CAST(sum(g) AS BIGINT) AS gain_checksum,
       CAST(sum(l) AS BIGINT) AS loss_checksum
FROM flagged
GROUP BY symbol
"""


@register(
    "indicator_rsi_cutler",
    _RSI_ORACLE,
    doc="Cutler's 14-period RSI with overbought/oversold thresholds as "
    "exact BIGINT cross-products (10G>7(G+L) / 10G<3(G+L)) — lag diff "
    "+ one ROWS frame, single symbol-keyed shuffle (r8 indicators suite)",
)
def q_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    st = _stock(spark, sf_dir)
    order = ["trade_date", "order_key", "line_number"]
    wlag = Window.partitionBy("symbol").orderBy(*order)
    f = wlag.rowsBetween(-13, Window.currentRow)
    d = F.col("cents") - F.lag("cents").over(wlag)
    diffed = st.select("symbol", *order, d.alias("d"))
    framed = diffed.select(
        "symbol",
        F.count("d").over(f).alias("nd"),
        F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(0)).over(f).alias("g"),
        F.sum(F.when(F.col("d") < 0, -F.col("d")).otherwise(0)).over(f).alias("l"),
    ).where((F.col("nd") == 14) & (F.col("g") + F.col("l") > 0))
    g, l = F.col("g"), F.col("l")
    flagged = framed.select(
        "symbol",
        "g",
        "l",
        F.when(10 * g > 7 * (g + l), 1).otherwise(0).alias("overbought"),
        F.when(10 * g < 3 * (g + l), 1).otherwise(0).alias("oversold"),
    )
    return flagged.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_signals"),
        F.sum("overbought").alias("n_overbought"),
        F.sum("oversold").alias("n_oversold"),
        F.sum("g").alias("gain_checksum"),
        F.sum("l").alias("loss_checksum"),
    )


# ---------------------------------------------------------------------------
# Fixed-point EWMA (alpha = 1/4): e_1 = c_1; e_t = (3*e_{t-1} + c_t)
# div 4 — integer floor division makes the recurrence exactly
# replayable. Engine side: Catalyst aggregate() HOF over the sorted
# per-symbol series (JVM codegen, zero Python). Oracle side: DuckDB
# recursive CTE walks the identical recurrence (the ADPCM-decoder
# oracle pattern, queries_r8). Output carries the final state AND the
# running sum of every intermediate EWMA value, so a single mis-step
# anywhere in the fold breaks the hash.
# ---------------------------------------------------------------------------

_EWMA_ORACLE = f"""
WITH RECURSIVE {_STOCK_CTE},
base AS (
    SELECT symbol, cents,
           row_number() OVER (
               PARTITION BY symbol
               ORDER BY trade_date, order_key, line_number
           ) AS rn,
           count(*) OVER (PARTITION BY symbol) AS n
    FROM stock
),
walk(symbol, rn, n, acc, s) AS (
    SELECT symbol, rn, n, cents, cents FROM base WHERE rn = 1
    UNION ALL
    SELECT b.symbol, b.rn, b.n,
           (3 * w.acc + b.cents) // 4,
           w.s + (3 * w.acc + b.cents) // 4
    FROM walk w
    JOIN base b ON b.symbol = w.symbol AND b.rn = w.rn + 1
)
SELECT symbol,
       CAST(acc AS BIGINT) AS ewma_final,
       CAST(s AS BIGINT) AS ewma_sum,
       CAST(n AS BIGINT) AS n_obs
FROM walk
WHERE rn = n
"""


@register(
    "indicator_ewma_fold",
    _EWMA_ORACLE,
    doc="Fixed-point EWMA (alpha=1/4, integer floor recurrence) as a "
    "Catalyst aggregate() fold over array_sort(collect_list(struct)) — "
    "inherently-sequential smoothing kept JVM-side and bounded by "
    "series length, oracled by a DuckDB recursive-CTE replay of the "
    "identical recurrence (r8 indicators suite)",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ewma_fold_frame(_stock(spark, sf_dir))


def ewma_fold_frame(st: DataFrame) -> DataFrame:
    # Sort keys lead the struct so array_sort's lexicographic order IS
    # the deterministic row order; (order_key, line_number) is unique,
    # so ties cannot occur.
    arr = F.array_sort(
        F.collect_list(
            F.struct("trade_date", "order_key", "line_number", "cents")
        )
    )
    per_symbol = st.groupBy("symbol").agg(arr.alias("series"))
    fold = F.expr(
        """
        aggregate(
            series,
            named_struct('acc', CAST(0 AS BIGINT),
                         's',   CAST(0 AS BIGINT),
                         'cnt', CAST(0 AS BIGINT)),
            (st, x) -> named_struct(
                'acc', CASE WHEN st.cnt = 0 THEN x.cents
                            ELSE (3 * st.acc + x.cents) div 4 END,
                's',   st.s + CASE WHEN st.cnt = 0 THEN x.cents
                                   ELSE (3 * st.acc + x.cents) div 4 END,
                'cnt', st.cnt + 1)
        )
        """
    )
    return per_symbol.select(
        "symbol",
        fold.alias("st"),
    ).select(
        "symbol",
        F.col("st.acc").alias("ewma_final"),
        F.col("st.s").alias("ewma_sum"),
        F.col("st.cnt").alias("n_obs"),
    )


# ---------------------------------------------------------------------------
# Maximum drawdown: running peak minus close, all integer cents. The
# classic risk metric the reference's pct_change layer feeds into.
# ---------------------------------------------------------------------------

_DRAWDOWN_ORACLE = f"""
WITH {_STOCK_CTE},
tracked AS (
    SELECT symbol, cents,
           max(cents) OVER (
               PARTITION BY symbol ORDER BY trade_date, order_key, line_number
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - cents AS dd
    FROM stock
)
SELECT symbol,
       CAST(max(dd) AS BIGINT) AS max_drawdown_cents,
       CAST(sum(dd) AS BIGINT) AS drawdown_sum,
       CAST(max(cents) AS BIGINT) AS peak_cents,
       CAST(count(*) AS BIGINT) AS n_obs
FROM tracked
GROUP BY symbol
"""


@register(
    "indicator_max_drawdown",
    _DRAWDOWN_ORACLE,
    doc="Per-symbol maximum drawdown from the running peak, exact "
    "integer cents — one cumulative-max window + a co-partitioned "
    "group reduction, single shuffle (r8 indicators suite)",
)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    st = _stock(spark, sf_dir)
    w = (
        Window.partitionBy("symbol")
        .orderBy("trade_date", "order_key", "line_number")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tracked = st.select(
        "symbol",
        "cents",
        (F.max("cents").over(w) - F.col("cents")).alias("dd"),
    )
    return tracked.groupBy("symbol").agg(
        F.max("dd").alias("max_drawdown_cents"),
        F.sum("dd").alias("drawdown_sum"),
        F.max("cents").alias("peak_cents"),
        F.count(F.lit(1)).alias("n_obs"),
    )


# ---------------------------------------------------------------------------
# Wave 2 — cross-series indicators: market breadth, rolling beta vs
# the market, daily VWAP, and an SMA-crossover BACKTEST (position
# state machine). The per-DATE market series these use is bounded by
# the trading calendar (~10^4 rows at any corpus size), so its global
# date-ordered window is a constant-size tail stage, not a scale
# risk; everything corpus-sized stays symbol- or date-partitioned.
# ---------------------------------------------------------------------------

# Advance/decline line: per symbol-day direction vs previous close,
# per-date breadth counts, cumulative (adv - dec) over the calendar.
_ADVANCE_DECLINE_ORACLE = f"""
WITH {_STOCK_CTE},
daily AS (
    SELECT symbol, trade_date, sum(cents) AS sc
    FROM stock GROUP BY symbol, trade_date
),
dirs AS (
    SELECT trade_date,
           sc - lag(sc) OVER (PARTITION BY symbol ORDER BY trade_date) AS d
    FROM daily
),
breadth AS (
    SELECT trade_date,
           sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS advances,
           sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS declines,
           sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS unchanged
    FROM dirs
    WHERE d IS NOT NULL
    GROUP BY trade_date
)
SELECT CAST(trade_date AS DATE) AS trade_date,
       CAST(advances AS BIGINT) AS advances,
       CAST(declines AS BIGINT) AS declines,
       CAST(unchanged AS BIGINT) AS unchanged,
       CAST(sum(advances - declines) OVER (
           ORDER BY trade_date
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS ad_line
FROM breadth
"""


@register(
    "indicator_advance_decline",
    _ADVANCE_DECLINE_ORACLE,
    doc="market-breadth advance/decline line: symbol-partitioned lag "
    "for direction, date-keyed breadth counts, then the cumulative "
    "A/D line over the calendar-bounded date series — the only "
    "unpartitioned window runs over ~10^4 calendar rows regardless "
    "of corpus size (r8 indicators wave 2)",
)
def q_advance_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    st = _stock(spark, sf_dir)
    daily = st.groupBy("symbol", "trade_date").agg(F.sum("cents").alias("sc"))
    wlag = Window.partitionBy("symbol").orderBy("trade_date")
    d = (F.col("sc") - F.lag("sc").over(wlag)).alias("d")
    dirs = daily.select("trade_date", d).where(F.col("d").isNotNull())
    breadth = dirs.groupBy("trade_date").agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("advances"),
        F.sum(F.when(F.col("d") < 0, 1).otherwise(0)).alias("declines"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0)).alias("unchanged"),
    )
    wcal = Window.orderBy("trade_date").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return breadth.select(
        "trade_date",
        "advances",
        "declines",
        "unchanged",
        F.sum(F.col("advances") - F.col("declines")).over(wcal).alias("ad_line"),
    )


# Rolling market beta (20-day), sign/threshold tests kept exact:
# with x = symbol daily-notional diff, y = market-average diff,
# cov_n = n*Sxy - Sx*Sy and var_n = n*Syy - Sy*Sy share the same n^2
# denominator, so beta > 1 is cov_n > var_n and beta > 0 is
# cov_n > 0 — pure BIGINT (bounds: |x| <= 2.2e7, |y| <= 9e6,
# n = 20 => every term < 1e17 << 2^63).
_MARKET_BETA_ORACLE = f"""
WITH {_STOCK_CTE},
daily AS (
    SELECT symbol, trade_date, sum(cents) AS sc
    FROM stock GROUP BY symbol, trade_date
),
mkt AS (
    SELECT trade_date, sum(sc) // count(*) AS ma
    FROM daily GROUP BY trade_date
),
mdiff AS (
    SELECT trade_date,
           ma - lag(ma) OVER (ORDER BY trade_date) AS y
    FROM mkt
),
sdiff AS (
    SELECT symbol, trade_date,
           sc - lag(sc) OVER (PARTITION BY symbol ORDER BY trade_date) AS x
    FROM daily
),
paired AS (
    SELECT s.symbol, s.trade_date, s.x, m.y
    FROM sdiff s JOIN mdiff m ON m.trade_date = s.trade_date
    WHERE s.x IS NOT NULL AND m.y IS NOT NULL
),
framed AS (
    SELECT symbol,
           count(*) OVER f AS n,
           sum(x * y) OVER f AS sxy,
           sum(x) OVER f AS sx,
           sum(y) OVER f AS sy,
           sum(y * y) OVER f AS syy
    FROM paired
    WINDOW f AS (
        PARTITION BY symbol ORDER BY trade_date
        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
    )
),
tested AS (
    SELECT symbol,
           CASE WHEN n * sxy - sx * sy > 0 THEN 1 ELSE 0 END AS pos_beta,
           CASE WHEN n * sxy - sx * sy > n * syy - sy * sy
                THEN 1 ELSE 0 END AS high_beta,
           n * sxy - sx * sy AS cov_n
    FROM framed
    WHERE n = 20 AND n * syy - sy * sy > 0
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(pos_beta) AS BIGINT) AS n_pos_beta,
       CAST(sum(high_beta) AS BIGINT) AS n_high_beta,
       CAST(sum(cov_n) AS BIGINT) AS cov_checksum
FROM tested
GROUP BY symbol
"""


@register(
    "indicator_market_beta",
    _MARKET_BETA_ORACLE,
    doc="rolling 20-day beta vs the market-average series: two "
    "aligned diff series joined on date, covariance/variance "
    "cross-multiplied into exact BIGINT sign and beta>1 tests (same "
    "n^2 denominator cancels); market series is calendar-bounded, "
    "corpus work stays symbol-partitioned (r8 indicators wave 2)",
)
def q_market_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    st = _stock(spark, sf_dir)
    daily = st.groupBy("symbol", "trade_date").agg(F.sum("cents").alias("sc"))
    mkt = daily.groupBy("trade_date").agg(
        F.expr("sum(sc) div count(*)").alias("ma")
    )
    wcal = Window.orderBy("trade_date")
    mdiff = mkt.select(
        "trade_date", (F.col("ma") - F.lag("ma").over(wcal)).alias("y")
    ).where(F.col("y").isNotNull())
    wsym = Window.partitionBy("symbol").orderBy("trade_date")
    sdiff = daily.select(
        "symbol",
        "trade_date",
        (F.col("sc") - F.lag("sc").over(wsym)).alias("x"),
    ).where(F.col("x").isNotNull())
    paired = sdiff.join(F.broadcast(mdiff), "trade_date")
    f = wsym.rowsBetween(-19, Window.currentRow)
    x, y = F.col("x"), F.col("y")
    framed = paired.select(
        "symbol",
        F.count(F.lit(1)).over(f).alias("n"),
        F.sum(x * y).over(f).alias("sxy"),
        F.sum(x).over(f).alias("sx"),
        F.sum(y).over(f).alias("sy"),
        F.sum(y * y).over(f).alias("syy"),
    )
    n, sxy, sx, sy, syy = (F.col(c) for c in ("n", "sxy", "sx", "sy", "syy"))
    cov_n, var_n = n * sxy - sx * sy, n * syy - sy * sy
    tested = framed.where((n == 20) & (var_n > 0)).select(
        "symbol",
        F.when(cov_n > 0, 1).otherwise(0).alias("pos_beta"),
        F.when(cov_n > var_n, 1).otherwise(0).alias("high_beta"),
        cov_n.alias("cov_n"),
    )
    return tested.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("pos_beta").alias("n_pos_beta"),
        F.sum("high_beta").alias("n_high_beta"),
        F.sum("cov_n").alias("cov_checksum"),
    )


# Daily VWAP kept as exact integer fractions, reduced per symbol.
_VWAP_ORACLE = """
WITH px AS (
    SELECT l_partkey AS symbol,
           CAST(l_shipdate AS DATE) AS trade_date,
           CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
           CAST(floor(l_quantity) AS BIGINT) AS qty
    FROM lineitem
),
vwap AS (
    SELECT symbol, trade_date,
           sum(cents * qty) AS num, sum(qty) AS den
    FROM px GROUP BY symbol, trade_date
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(num) AS BIGINT) AS num_total,
       CAST(sum(den) AS BIGINT) AS den_total,
       CAST(max(num // den) AS BIGINT) AS max_daily_vwap_cents
FROM vwap
WHERE den > 0
GROUP BY symbol
"""


@register(
    "indicator_vwap_daily",
    _VWAP_ORACLE,
    doc="daily VWAP as exact integer fractions (num = sum cents*qty, "
    "den = sum qty; floor-div only at the final projection) reduced "
    "per symbol — one partial-agg shuffle (r8 indicators wave 2)",
)
def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    px = li.select(
        F.col("l_partkey").alias("symbol"),
        F.to_date("l_shipdate").alias("trade_date"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.floor(F.col("l_quantity")).cast("bigint").alias("qty"),
    )
    vwap = px.groupBy("symbol", "trade_date").agg(
        F.sum(F.col("cents") * F.col("qty")).alias("num"),
        F.sum("qty").alias("den"),
    )
    return (
        vwap.where(F.col("den") > 0)
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("num").alias("num_total"),
            F.sum("den").alias("den_total"),
            F.max(F.expr("num div den")).alias("max_daily_vwap_cents"),
        )
    )


# ---------------------------------------------------------------------------
# SMA-crossover backtest: fast(5) over slow(20) moving-average
# signal, long/flat position state machine walked per symbol, P&L in
# exact integer cents. The signal is a pure window comparison kept
# exact by cross-multiplying the two frame means (sf5*n20 > ss20*n5);
# the inherently-sequential position walk is the Catalyst aggregate()
# fold (same boundedness as the EWMA fold), oracled by a DuckDB
# recursive-CTE replay of the identical state machine.
# ---------------------------------------------------------------------------

_BACKTEST_ORACLE = f"""
WITH RECURSIVE {_STOCK_CTE},
sig AS (
    SELECT symbol, cents,
           CASE WHEN count(*) OVER ws = 20
                 AND sum(cents) OVER wf * 20 > sum(cents) OVER ws * count(*) OVER wf
                THEN 1 ELSE 0 END AS long_sig,
           row_number() OVER (
               PARTITION BY symbol
               ORDER BY trade_date, order_key, line_number
           ) AS rn,
           count(*) OVER (PARTITION BY symbol) AS n
    FROM stock
    WINDOW wf AS (
        PARTITION BY symbol ORDER BY trade_date, order_key, line_number
        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
    ), ws AS (
        PARTITION BY symbol ORDER BY trade_date, order_key, line_number
        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
    )
),
walk(symbol, rn, n, pos, entry, pnl, trades, last_c) AS (
    SELECT symbol, rn, n, long_sig,
           CASE WHEN long_sig = 1 THEN cents ELSE 0 END,
           0, long_sig, cents
    FROM sig WHERE rn = 1
    UNION ALL
    SELECT s.symbol, s.rn, s.n,
           s.long_sig,
           CASE WHEN w.pos = 0 AND s.long_sig = 1 THEN s.cents
                WHEN w.pos = 1 AND s.long_sig = 1 THEN w.entry
                ELSE 0 END,
           w.pnl + CASE WHEN w.pos = 1 AND s.long_sig = 0
                        THEN s.cents - w.entry ELSE 0 END,
           w.trades + CASE WHEN w.pos = 0 AND s.long_sig = 1
                           THEN 1 ELSE 0 END,
           s.cents
    FROM walk w
    JOIN sig s ON s.symbol = w.symbol AND s.rn = w.rn + 1
)
SELECT symbol,
       CAST(pnl AS BIGINT) AS realized_pnl_cents,
       CAST(trades AS BIGINT) AS n_trades,
       CAST(pos AS BIGINT) AS final_pos,
       CAST(CASE WHEN pos = 1 THEN last_c - entry ELSE 0 END AS BIGINT)
           AS unrealized_cents,
       CAST(n AS BIGINT) AS n_obs
FROM walk
WHERE rn = n
"""


@register(
    "indicator_sma_backtest",
    _BACKTEST_ORACLE,
    doc="SMA 5/20 crossover backtest: exact cross-multiplied signal "
    "(sf5*n20 > ss20*nf), long/flat position state machine with "
    "integer-cents realized/unrealized P&L walked per symbol by a "
    "Catalyst aggregate() fold over the sorted series, oracled by a "
    "recursive-CTE replay of the identical machine (r8 indicators "
    "wave 2)",
)
def q_sma_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return backtest_frame(_stock(spark, sf_dir))


def backtest_frame(st: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    order = ["trade_date", "order_key", "line_number"]
    w = Window.partitionBy("symbol").orderBy(*order)
    wf, ws = w.rowsBetween(-4, 0), w.rowsBetween(-19, 0)
    long_sig = F.when(
        (F.count(F.lit(1)).over(ws) == 20)
        & (
            F.sum("cents").over(wf) * 20
            > F.sum("cents").over(ws) * F.count(F.lit(1)).over(wf)
        ),
        1,
    ).otherwise(0)
    sig = st.select("symbol", *order, "cents", long_sig.alias("long_sig"))
    arr = F.array_sort(
        F.collect_list(
            F.struct("trade_date", "order_key", "line_number", "cents", "long_sig")
        )
    )
    per_symbol = sig.groupBy("symbol").agg(arr.alias("series"))
    fold = F.expr(
        """
        aggregate(
            series,
            named_struct('pos', CAST(0 AS BIGINT), 'entry', CAST(0 AS BIGINT),
                         'pnl', CAST(0 AS BIGINT), 'trades', CAST(0 AS BIGINT),
                         'last_c', CAST(0 AS BIGINT), 'cnt', CAST(0 AS BIGINT)),
            (st, x) -> named_struct(
                'pos',   CAST(x.long_sig AS BIGINT),
                'entry', CASE WHEN st.pos = 0 AND x.long_sig = 1 THEN x.cents
                              WHEN st.pos = 1 AND x.long_sig = 1 THEN st.entry
                              ELSE CAST(0 AS BIGINT) END,
                'pnl',   st.pnl + CASE WHEN st.pos = 1 AND x.long_sig = 0
                                       THEN x.cents - st.entry
                                       ELSE CAST(0 AS BIGINT) END,
                'trades', st.trades + CASE WHEN st.pos = 0 AND x.long_sig = 1
                                           THEN CAST(1 AS BIGINT)
                                           ELSE CAST(0 AS BIGINT) END,
                'last_c', x.cents,
                'cnt',    st.cnt + 1)
        )
        """
    )
    folded = per_symbol.select("symbol", fold.alias("st"))
    return folded.select(
        "symbol",
        F.col("st.pnl").alias("realized_pnl_cents"),
        F.col("st.trades").alias("n_trades"),
        F.col("st.pos").alias("final_pos"),
        F.when(F.col("st.pos") == 1, F.col("st.last_c") - F.col("st.entry"))
        .otherwise(0)
        .alias("unrealized_cents"),
        F.col("st.cnt").alias("n_obs"),
    )


# ---------------------------------------------------------------------------
# Wave 3 — stochastic oscillator, on-balance volume, and historical
# portfolio VaR (the risk capstone: exact order statistic over the
# calendar-bounded daily P&L series via the distributed global-rank
# pattern, never a single-task global window).
# ---------------------------------------------------------------------------

# Stochastic %K (14): rolling low/high frames; %K>80 and %K<20 kept
# exact by cross-multiplication (5*(c-low) vs 4*(high-low) / (high-low)).
_STOCHASTIC_ORACLE = f"""
WITH {_STOCK_CTE},
framed AS (
    SELECT symbol, cents,
           count(*) OVER f AS n,
           min(cents) OVER f AS lo,
           max(cents) OVER f AS hi
    FROM stock
    WINDOW f AS (
        PARTITION BY symbol ORDER BY trade_date, order_key, line_number
        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW
    )
),
flagged AS (
    SELECT symbol,
           cents - lo AS span_up,
           hi - lo AS range_k,
           CASE WHEN 5 * (cents - lo) > 4 * (hi - lo) THEN 1 ELSE 0 END
               AS overbought,
           CASE WHEN 5 * (cents - lo) < (hi - lo) THEN 1 ELSE 0 END
               AS oversold
    FROM framed
    WHERE n = 14 AND hi > lo
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_signals,
       CAST(sum(overbought) AS BIGINT) AS n_overbought,
       CAST(sum(oversold) AS BIGINT) AS n_oversold,
       CAST(sum(span_up) AS BIGINT) AS span_checksum,
       CAST(sum(range_k) AS BIGINT) AS range_checksum
FROM flagged
GROUP BY symbol
"""


@register(
    "indicator_stochastic_k",
    _STOCHASTIC_ORACLE,
    doc="stochastic %K(14) with overbought/oversold as exact BIGINT "
    "cross-products over rolling min/max frames — one symbol-keyed "
    "shuffle (r8 indicators wave 3)",
)
def q_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    st = _stock(spark, sf_dir)
    f = (
        Window.partitionBy("symbol")
        .orderBy("trade_date", "order_key", "line_number")
        .rowsBetween(-13, Window.currentRow)
    )
    framed = st.select(
        "symbol",
        "cents",
        F.count(F.lit(1)).over(f).alias("n"),
        F.min("cents").over(f).alias("lo"),
        F.max("cents").over(f).alias("hi"),
    ).where((F.col("n") == 14) & (F.col("hi") > F.col("lo")))
    up = F.col("cents") - F.col("lo")
    rng = F.col("hi") - F.col("lo")
    flagged = framed.select(
        "symbol",
        up.alias("span_up"),
        rng.alias("range_k"),
        F.when(5 * up > 4 * rng, 1).otherwise(0).alias("overbought"),
        F.when(5 * up < rng, 1).otherwise(0).alias("oversold"),
    )
    return flagged.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_signals"),
        F.sum("overbought").alias("n_overbought"),
        F.sum("oversold").alias("n_oversold"),
        F.sum("span_up").alias("span_checksum"),
        F.sum("range_k").alias("range_checksum"),
    )


# On-balance volume: cumulative sign(price diff) * quantity, exact.
_OBV_ORACLE = """
WITH px AS (
    SELECT l_partkey AS symbol,
           CAST(l_shipdate AS DATE) AS trade_date,
           l_orderkey AS order_key,
           l_linenumber AS line_number,
           CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
           CAST(floor(l_quantity) AS BIGINT) AS qty
    FROM lineitem
),
diffed AS (
    SELECT symbol, trade_date, order_key, line_number, qty,
           cents - lag(cents) OVER w AS d
    FROM px
    WINDOW w AS (
        PARTITION BY symbol ORDER BY trade_date, order_key, line_number
    )
),
obv AS (
    SELECT symbol,
           sum(CASE WHEN d > 0 THEN qty WHEN d < 0 THEN -qty ELSE 0 END)
               OVER (
                   PARTITION BY symbol
                   ORDER BY trade_date, order_key, line_number
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS v
    FROM diffed
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(max(v) AS BIGINT) AS obv_max,
       CAST(min(v) AS BIGINT) AS obv_min,
       CAST(sum(v) AS BIGINT) AS obv_checksum
FROM obv
GROUP BY symbol
"""


@register(
    "indicator_obv",
    _OBV_ORACLE,
    doc="on-balance volume: cumulative sign(diff)*qty per symbol, all "
    "BIGINT — lag + running sum in one symbol-keyed sort (r8 "
    "indicators wave 3)",
)
def q_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    px = li.select(
        F.col("l_partkey").alias("symbol"),
        F.to_date("l_shipdate").alias("trade_date"),
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.floor(F.col("l_quantity")).cast("bigint").alias("qty"),
    )
    order = ["trade_date", "order_key", "line_number"]
    w = Window.partitionBy("symbol").orderBy(*order)
    diffed = px.select(
        "symbol", *order, "qty", (F.col("cents") - F.lag("cents").over(w)).alias("d")
    )
    delta = (
        F.when(F.col("d") > 0, F.col("qty"))
        .when(F.col("d") < 0, -F.col("qty"))
        .otherwise(0)
    )
    obv = diffed.select(
        "symbol",
        F.sum(delta)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("v"),
    )
    return obv.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.max("v").alias("obv_max"),
        F.min("v").alias("obv_min"),
        F.sum("v").alias("obv_checksum"),
    )


# Historical-simulation portfolio VaR: the portfolio's daily P&L is
# the cross-symbol sum of daily-notional diffs; VaR95 is the EXACT
# k-th smallest daily P&L with k = n div 20 + 1. The daily series is
# calendar-bounded, but the order statistic still uses the
# distributed global-rank pattern (range-sort + offsets) rather than
# a single-task global window — same discipline as
# feature_equidepth_histogram.
_PORTFOLIO_VAR_ORACLE = f"""
WITH {_STOCK_CTE},
daily AS (
    SELECT symbol, trade_date, sum(cents) AS sc
    FROM stock GROUP BY symbol, trade_date
),
sdiff AS (
    SELECT symbol, trade_date,
           sc - lag(sc) OVER (PARTITION BY symbol ORDER BY trade_date) AS x
    FROM daily
),
pnl AS (
    SELECT trade_date, sum(x) AS p
    FROM sdiff WHERE x IS NOT NULL
    GROUP BY trade_date
),
ranked AS (
    SELECT trade_date, p,
           row_number() OVER (ORDER BY p, trade_date) AS rn,
           count(*) OVER () AS n
    FROM pnl
)
SELECT CAST(trade_date AS DATE) AS var_day,
       CAST(p AS BIGINT) AS var95_cents,
       CAST(n AS BIGINT) AS n_days,
       CAST(rn AS BIGINT) AS k
FROM ranked
WHERE rn = n // 20 + 1
"""


@register(
    "indicator_portfolio_var",
    _PORTFOLIO_VAR_ORACLE,
    doc="historical-simulation portfolio VaR95: cross-symbol daily "
    "P&L, exact k-th smallest (k = n div 20 + 1) via the distributed "
    "global-rank pattern over the calendar-bounded series — no "
    "single-task global window (r8 indicators wave 3)",
)
def q_portfolio_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.window_metrics import with_global_rank

    st = _stock(spark, sf_dir)
    daily = st.groupBy("symbol", "trade_date").agg(F.sum("cents").alias("sc"))
    wsym = Window.partitionBy("symbol").orderBy("trade_date")
    sdiff = daily.select(
        "symbol", "trade_date", (F.col("sc") - F.lag("sc").over(wsym)).alias("x")
    ).where(F.col("x").isNotNull())
    pnl = sdiff.groupBy("trade_date").agg(F.sum("x").alias("p"))
    ranked = with_global_rank(pnl, ["p", "trade_date"], rank_col="rn")
    total = pnl.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.join(F.broadcast(total))
        .where(F.col("rn") == F.expr("n div 20 + 1"))
        .select(
            F.col("trade_date").alias("var_day"),
            F.col("p").alias("var95_cents"),
            F.col("n").alias("n_days"),
            F.col("rn").alias("k"),
        )
    )
