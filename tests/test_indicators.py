"""Indicator-suite invariants (plans/queries_indicators.py).

The oracle parity sweep already proves Spark == DuckDB on the test
corpora; these tests pin the SEMANTICS against straight Python
replays on adversarial series, so both engines agreeing on a wrong
recurrence cannot slip through (the same belt-and-braces as
test_bpe_fold_oracle / test_adpcm_codec).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# The fold expression under test, applied to an explicit series.
_FOLD = """
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


def _ewma_py(cents: list[int]) -> tuple[int, int]:
    acc = s = 0
    for i, c in enumerate(cents):
        acc = c if i == 0 else (3 * acc + c) // 4
        s += acc
    return acc, s


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=11_000_000), min_size=1, max_size=60))
def test_ewma_fold_matches_python_replay(spark, cents):
    df = spark.createDataFrame(
        [([{"cents": c} for c in cents],)], "series array<struct<cents:bigint>>"
    )
    row = df.select(F.expr(_FOLD).alias("st")).select("st.acc", "st.s", "st.cnt").first()
    acc, s = _ewma_py(cents)
    assert (row["acc"], row["s"], row["cnt"]) == (acc, s, len(cents))


def test_bollinger_cross_multiply_equals_float_band(spark):
    # The sqrt-free BIGINT band test must agree with the textbook
    # float formulation |c - mean| > 2*sigma on a series that sits
    # exactly at, just inside, and just outside the band.
    import math
    import random

    rng = random.Random(7)
    cents = [rng.randrange(0, 11_000_000) for _ in range(200)]
    n = 20
    for t in range(n - 1, len(cents)):
        frame = cents[t - n + 1 : t + 1]
        s, q, c = sum(frame), sum(x * x for x in frame), cents[t]
        dev, var4 = c * n - s, 4 * (n * q - s * s)
        got_up = dev > 0 and dev * dev > var4
        got_dn = dev < 0 and dev * dev > var4
        mean = s / n
        sigma = math.sqrt(q / n - mean * mean)
        assert got_up == (c > mean and (c - mean) ** 2 > 4 * sigma**2)
        assert got_dn == (c < mean and (mean - c) ** 2 > 4 * sigma**2)


def test_rsi_threshold_cross_products():
    # 10G > 7(G+L) iff RSI = 100G/(G+L) > 70, exactly, including the
    # boundary where RSI == 70 (not overbought) and == 30 (not oversold).
    for g in range(0, 50):
        for l in range(0, 50):
            if g + l == 0:
                continue
            rsi = 100 * g / (g + l)
            assert (10 * g > 7 * (g + l)) == (rsi > 70)
            assert (10 * g < 3 * (g + l)) == (rsi < 30)


def test_indicator_queries_single_shuffle(spark):
    # Bollinger / RSI / drawdown: the window sort and the per-symbol
    # reduction must share ONE symbol-keyed exchange — a second
    # exchange would mean the groupBy re-shuffled what the window
    # already partitioned.
    from sp500_stock_etl_spark.plans.queries_indicators import (
        q_bollinger,
        q_drawdown,
        q_rsi,
    )

    for fn in (q_bollinger, q_rsi, q_drawdown):
        plan = fn(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        n_exchange = plan.count("Exchange hashpartitioning")
        assert n_exchange <= 1, f"{fn.__name__}: {n_exchange} hash exchanges\n{plan}"


_BT_FOLD = """
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


def _backtest_py(rows: list[tuple[int, int]]) -> tuple[int, int, int]:
    pos = entry = pnl = trades = 0
    for c, sig in rows:
        if pos == 0 and sig == 1:
            entry, trades = c, trades + 1
        elif pos == 1 and sig == 0:
            pnl += c - entry
            entry = 0
        pos = sig
    return pnl, trades, pos


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11_000_000),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_backtest_fold_matches_python_state_machine(spark, rows):
    df = spark.createDataFrame(
        [([{"cents": c, "long_sig": s} for c, s in rows],)],
        "series array<struct<cents:bigint,long_sig:int>>",
    )
    r = df.select(F.expr(_BT_FOLD).alias("st")).select(
        "st.pnl", "st.trades", "st.pos"
    ).first()
    assert (r["pnl"], r["trades"], r["pos"]) == _backtest_py(rows)


def test_beta_cross_multiply_matches_float_beta(spark):
    # cov_n > var_n iff beta > 1 and cov_n > 0 iff beta > 0, on a
    # window where var > 0 — the exact tests must agree with the
    # float covariance/variance ratio.
    import random

    rng = random.Random(11)
    for _ in range(200):
        xs = [rng.randrange(-22_000_000, 22_000_000) for _ in range(20)]
        ys = [rng.randrange(-9_000_000, 9_000_000) for _ in range(20)]
        n = 20
        sxy = sum(a * b for a, b in zip(xs, ys))
        sx, sy, syy = sum(xs), sum(ys), sum(b * b for b in ys)
        cov_n, var_n = n * sxy - sx * sy, n * syy - sy * sy
        if var_n <= 0:
            continue
        beta = cov_n / var_n
        assert (cov_n > 0) == (beta > 0)
        assert (cov_n > var_n) == (beta > 1)


# --- Wave 4 pins -----------------------------------------------------------


def _cusum_py(diffs: list[int], k: int = 100) -> list[int]:
    """Sequential reference: S_t = max(0, S_{t-1} + d_t - k)."""
    s, out = 0, []
    for d in diffs:
        s = max(0, s + d - k)
        out.append(s)
    return out


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-11_000_000, max_value=11_000_000),
        min_size=1,
        max_size=80,
    )
)
def test_cusum_closed_form_equals_sequential_fold(spark, diffs):
    # The query's identity S_t = C_t - least(0, running_min(C)) with
    # C = cumsum(d - k) must reproduce the textbook sequential
    # recurrence max(0, S + d - k) on arbitrary signed series.
    from pyspark.sql import Window

    rows = [(i, d) for i, d in enumerate(diffs)]
    df = spark.createDataFrame(rows, "i bigint, d bigint")
    wrun = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = df.select("i", F.sum(F.col("d") - 100).over(wrun).alias("c"))
    got = (
        cum.select(
            "i",
            (F.col("c") - F.least(F.lit(0).cast("bigint"), F.min("c").over(wrun))).alias("s"),
        )
        .orderBy("i")
        .select("s")
        .collect()
    )
    assert [r["s"] for r in got] == _cusum_py(diffs)


def test_drawdown_duration_matches_python_replay(spark):
    # Spell segmentation (islands keyed by running count of peak rows)
    # vs a direct scan: longest underwater run and total underwater
    # rows on a series with ties, double peaks, and a trailing spell.
    import random

    rng = random.Random(11)
    cents = [rng.randrange(0, 100) for _ in range(300)]

    peak, cur, spells = -1, 0, []
    for c in cents:
        peak = max(peak, c)
        if c < peak:
            cur += 1
        else:
            if cur:
                spells.append(cur)
            cur = 0
    if cur:
        spells.append(cur)

    from pyspark.sql import Window

    df = spark.createDataFrame([(i, c) for i, c in enumerate(cents)], "i bigint, cents bigint")
    wrun = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    peaked = df.select("i", "cents", F.max("cents").over(wrun).alias("runmax"))
    marked = peaked.select(
        "cents",
        "runmax",
        F.sum(F.when(F.col("cents") == F.col("runmax"), 1).otherwise(0))
        .over(wrun)
        .alias("spell"),
    )
    got = (
        marked.where(F.col("cents") < F.col("runmax"))
        .groupBy("spell")
        .agg(F.count(F.lit(1)).alias("len"))
        .select("len")
        .collect()
    )
    got_lens = sorted(r["len"] for r in got)
    assert got_lens == sorted(spells)
    assert (max(got_lens) if got_lens else 0) == (max(spells) if spells else 0)


def test_wave4_queries_single_shuffle(spark):
    # CUSUM (two stacked windows + reduction), runs test, and
    # drawdown duration must all run on ONE symbol-keyed exchange —
    # the stacked windows and groupBys share the window sort's
    # partitioning.
    from sp500_stock_etl_spark.plans.queries_indicators import (
        q_cusum,
        q_drawdown_duration,
        q_runs_test,
    )

    for fn in (q_cusum, q_drawdown_duration, q_runs_test):
        plan = fn(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        n_exchange = plan.count("Exchange hashpartitioning")
        assert n_exchange <= 1, f"{fn.__name__}: {n_exchange} hash exchanges\n{plan}"
