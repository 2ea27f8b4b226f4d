"""Advanced analytics extensions (SURVEY.md §7.3): GROUPING SETS,
window navigation functions, filtered/conditional aggregates, exact
quantiles, and an interval range join.

Same reproducibility policy as queries_extensions.py: float columns
pass through untouched or go through exact decimal/integer arithmetic;
every computed column is aliased identically in the DataFrame plan and
the DuckDB oracle (driver hashes values after sorting columns by
name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io.readers import load_table
from ..operators.aggregates import dec
from .registry import register

# ---------------------------------------------------------------------------
# GROUPING SETS — the general form behind rollup/cube (already
# covered); Catalyst expands to an Expand node feeding one hash
# aggregate, i.e. one shuffle regardless of how many sets. grouping()
# flags disambiguate "NULL because aggregated away" from data NULLs.
# ---------------------------------------------------------------------------

_GROUPING_SETS_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register(
    "grouping_sets_agg",
    _GROUPING_SETS_ORACLE,
    doc="GROUPING SETS with grouping() markers — Expand + single hash "
    "aggregate, one shuffle for all sets (SURVEY §2.8 ext)",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Window navigation: lead/lag with offset+default, first/last/nth
# value under explicit ROWS frames and a total order (ties broken by
# key) so every value is deterministic. No arithmetic on the doubles —
# they pass through bit-identically in both engines.
# ---------------------------------------------------------------------------

_NAV_ORACLE = """
SELECT o_orderkey,
       o_orderpriority,
       lead(o_totalprice, 2, -1.0) OVER w AS lead2_price,
       lag(o_totalprice, 2, -1.0) OVER w AS lag2_price,
       first_value(o_totalprice) OVER
         (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_first,
       last_value(o_totalprice) OVER
         (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS remaining_last,
       nth_value(o_totalprice, 3) OVER
         (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_price
FROM orders
WHERE o_orderkey % 41 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey)
"""


@register(
    "window_navigation_suite",
    _NAV_ORACLE,
    doc="lead/lag with default, first/last/nth_value under explicit ROWS "
    "frames (SURVEY §2.5 ext)",
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 41 == 0
    )
    w = W.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
    growing = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    shrinking = w.rowsBetween(W.currentRow, W.unboundedFollowing)
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    price = F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.lead(price, 2, -1.0).over(w).alias("lead2_price"),
        F.lag(price, 2, -1.0).over(w).alias("lag2_price"),
        F.first(price).over(growing).alias("running_first"),
        F.last(price).over(shrinking).alias("remaining_last"),
        F.nth_value(price, 3).over(full).alias("third_price"),
    )


# ---------------------------------------------------------------------------
# Conditional / filtered aggregates: FILTER clause, bool_and/bool_or,
# count-distinct, arg-max with an explicit total-order tiebreak (the
# (value, key) struct) so the winner is unique in both engines.
# ---------------------------------------------------------------------------

_COND_AGG_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_totalprice > 100000.0) AS n_big,
       bool_and(o_totalprice > 1000.0) AS all_over_1k,
       bool_or(o_orderstatus = 'F') AS any_finished,
       count(DISTINCT o_orderstatus) AS n_statuses,
       (max(struct_pack(p := o_totalprice, k := o_orderkey))).k AS top_order_key
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "conditional_agg_suite",
    _COND_AGG_ORACLE,
    doc="FILTER-clause counts, bool_and/bool_or, tie-broken arg_max "
    "(SURVEY §2.8 ext)",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_totalprice") > 100000.0, 1)).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.max(
            F.struct(
                F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")
            )
        )["k"].alias("top_order_key"),
    )


# ---------------------------------------------------------------------------
# Exact quantiles: Spark percentile() == DuckDB quantile_cont (both
# interpolate at p*(n-1)). l_quantity is integral-valued, so the
# interpolated fractions (.25/.5/.75) are exact binary fractions —
# bitwise parity holds regardless of each engine's formula ordering.
# At 100 TB the monitoring path swaps in approx_percentile (t-digest,
# one pass, mergeable) — see tests/test_sketches.py.
# ---------------------------------------------------------------------------

_QUANTILE_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.75) AS q75,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "exact_quantiles",
    _QUANTILE_ORACLE,
    doc="exact percentile (sort-based) per group; approx_percentile is "
    "the documented 100 TB monitoring variant (SURVEY §2.8 ext)",
)
def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.percentile(q, 0.25).alias("q25"),
        F.percentile(q, 0.5).alias("median_qty"),
        F.percentile(q, 0.75).alias("q75"),
        F.min(q).alias("min_qty"),
        F.max(q).alias("max_qty"),
    )


# ---------------------------------------------------------------------------
# Interval range join: every follow-up event of the same user within
# one hour after a purchase (band join, not as-of: ALL matches, not
# just the nearest). The equi component (user_id) makes this a
# sort-merge join with the band as a residual predicate — no
# broadcast-nested-loop. At 100 TB: additionally bucket both sides by
# time bin (epoch/3600) and join on (user_id, bin) ∪ (user_id, bin+1)
# to bound each probe's scan to two bins; here user_id alone bounds
# candidates enough that the residual filter is cheap.
# ---------------------------------------------------------------------------

_RANGE_JOIN_ORACLE = """
SELECT a.event_id AS purchase_id,
       b.event_id AS follow_id,
       b.event_type AS follow_type
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
WHERE a.event_type = 'purchase'
"""


@register(
    "range_interval_join",
    _RANGE_JOIN_ORACLE,
    doc="band/interval join (all same-user events within 1h after each "
    "purchase) — equi key + range residual (SURVEY §2.9 custom op)",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    follows = ev.select(
        F.col("event_id").alias("follow_id"),
        F.col("event_type").alias("follow_type"),
        "user_id",
        "ts",
    )
    return purchases.join(
        follows,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("ts") > F.col("p_ts"))
        & (F.col("ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", "follow_id", "follow_type")


# ---------------------------------------------------------------------------
# Sketch-based monitoring profile — the 100 TB shape of the
# reference's QA aggregates (SURVEY §2.8 A2): approx_count_distinct
# (HLL++, mergeable, fixed memory) and approx_percentile in place of
# exact count-distinct / sort-based percentile, so the whole profile
# is one map-side-combinable pass with no exact-distinct shuffle.
# Sketch outputs are engine-specific, so no DuckDB value oracle
# (rows-only check here); tests/test_sketches.py bounds the error
# against the exact answers instead.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Grouped-map escape hatch (SURVEY §2.12): the reference's per-symbol
# loop body (dags/sp500_dag.py.py:95-207) IS a grouped-map UDF — one
# group's frame in, a transformed frame out. This query runs that
# exact shape through applyInPandas (Arrow-batched, one shuffle on
# the group key) and the oracle is the DECLARATIVE window form — so
# parity proves the imperative pandas path and the Catalyst window
# path compute the same thing bit-for-bit. Use the declarative form
# unless semantics genuinely can't be expressed (this one can; it
# exists to keep the escape hatch tested).
# ---------------------------------------------------------------------------

_GROUPED_MAP_ORACLE = """
SELECT event_id,
       user_id,
       COALESCE(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                0.0) AS value_diff
FROM events
"""


def _pandas_value_diff(pdf):
    pdf = pdf.sort_values(["ts", "event_id"])
    pdf["value_diff"] = pdf["value"].diff().fillna(0.0)
    return pdf[["event_id", "user_id", "value_diff"]]


@register(
    "grouped_map_value_diff",
    _GROUPED_MAP_ORACLE,
    doc="applyInPandas grouped-map (the reference's per-symbol loop as a "
    "real UDF, dags/sp500_dag.py.py:95-207) vs declarative-window oracle "
    "(SURVEY §2.12)",
)
def q_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    return ev.groupBy("user_id").applyInPandas(
        _pandas_value_diff,
        schema="event_id bigint, user_id bigint, value_diff double",
    )


# r8 oracle upgrade (the token_heavy_hitters_sketch certificate
# pattern): sketch outputs themselves are estimator artifacts, so the
# registered output is the deterministic CERTIFICATE — exact counts
# plus integer flags checking each sketch against its own error
# contract IN-QUERY: HLL++ estimates within 5×rsd of the exact
# distinct counts (theoretical relative std dev 1%, generous margin);
# each approx_percentile result's true rank within 2×(n/accuracy)+1
# of its target rank (the sketch's rank-error guarantee). The oracle
# recomputes the exact side and expects all-ones; a broken sketch or
# merge flips a flag and fails the hash. Raw estimates remain bound-
# tested in tests/test_sketches.py.

_APPROX_PROFILE_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(1 AS INT) AS hll_orders_ok,
       CAST(1 AS INT) AS hll_parts_ok,
       CAST(1 AS INT) AS p50_rank_ok,
       CAST(1 AS INT) AS p95_rank_ok,
       CAST(1 AS INT) AS p99_rank_ok
FROM lineitem
"""


@register(
    "approx_monitoring_profile",
    _APPROX_PROFILE_ORACLE,
    doc="HLL++ approx distinct + percentile sketches, hash-certified "
    "in-query (r8 upgrade): exact counts plus partitioning-independent "
    "flags — HLL within 5x its configured rsd, each approx percentile's "
    "true rank within the sketch's n/accuracy guarantee — oracle "
    "expects all-ones (SURVEY §2.8 A2; raw estimates bound-tested in "
    "tests/test_sketches.py)",
)
def q_approx_monitoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    acc = 10000
    sketch = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("a_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("a_parts"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), acc).alias("p50"),
        F.approx_percentile("l_extendedprice", F.lit(0.95), acc).alias("p95"),
        F.approx_percentile("l_extendedprice", F.lit(0.99), acc).alias("p99"),
    )
    exact = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    joined = exact.crossJoin(F.broadcast(sketch))
    # Rank check: count rows strictly below each sketch percentile in
    # a second conditional pass over the fact (one fused aggregate).
    ranks = (
        li.crossJoin(F.broadcast(sketch))
        .agg(
            F.sum((F.col("l_extendedprice") < F.col("p50")).cast("bigint")).alias("below_p50"),
            F.sum((F.col("l_extendedprice") < F.col("p95")).cast("bigint")).alias("below_p95"),
            F.sum((F.col("l_extendedprice") < F.col("p99")).cast("bigint")).alias("below_p99"),
        )
    )

    def hll_ok(approx, exact_c):
        err = F.abs(approx.cast("double") / exact_c.cast("double") - 1.0)
        return (err <= 0.05).cast("int")

    def rank_ok(below, q):
        target = F.col("n_rows").cast("double") * q
        slack = F.col("n_rows").cast("double") * 2.0 / acc + 1.0
        return (F.abs(below.cast("double") - target) <= slack).cast("int")

    return joined.crossJoin(F.broadcast(ranks)).select(
        "n_rows",
        "exact_orders",
        "exact_parts",
        hll_ok(F.col("a_orders"), F.col("exact_orders")).alias("hll_orders_ok"),
        hll_ok(F.col("a_parts"), F.col("exact_parts")).alias("hll_parts_ok"),
        rank_ok(F.col("below_p50"), 0.5).alias("p50_rank_ok"),
        rank_ok(F.col("below_p95"), 0.95).alias("p95_rank_ok"),
        rank_ok(F.col("below_p99"), 0.99).alias("p99_rank_ok"),
    )


# ---------------------------------------------------------------------------
# Batch sessionization (gaps-and-islands): the batch twin of the
# streaming session_window_agg. Session id = running count of
# gap-exceeded markers (lag + cumulative sum over the same window
# spec — ONE shuffle on user_id serves both window passes and the
# final per-session agg never reshuffles thanks to partial agg).
# Gap test in exact integer microseconds on both engines (second-
# truncating date_diff would disagree at sub-second boundaries).
# ---------------------------------------------------------------------------

_SESSIONIZE_ORACLE = """
WITH marked AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, ts, value,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
)
SELECT user_id,
       CAST(sid AS BIGINT) AS session_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM sess
GROUP BY user_id, sid
"""


@register(
    "batch_sessionization",
    _SESSIONIZE_ORACLE,
    doc="gaps-and-islands sessionization (30-min gap) via lag + running "
    "sum; batch twin of the streaming session windows (SURVEY §2.5 ext)",
)
def q_batch_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts", 1).over(w)
    )
    new_sess = F.when(gap_us > 1_800_000_000, 1).otherwise(0)
    sess = ev.withColumn(
        "sid",
        F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return sess.groupBy("user_id", F.col("sid").alias("session_id")).agg(
        F.date_format(F.min("ts"), fmt).alias("session_start"),
        F.date_format(F.max("ts"), fmt).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Gap-fill + forward-fill (the hypertable/timeseries resampling op):
# build the dense hour spine from the data's own bounds (sequence +
# explode — no driver loop), left-join the sparse per-user hourly
# sums, then carry the last observation forward per user
# (last_value IGNORE NULLS over a growing frame). Hours before a
# user's first observation stay NULL by design. The spine is
# users x hours (tiny vs the fact side) and the fill is one window
# pass — same shuffle key as the hourly aggregate.
# ---------------------------------------------------------------------------

_GAP_FILL_ORACLE = """
WITH bounds AS (
    SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
    FROM events
),
users AS (
    SELECT DISTINCT user_id FROM events WHERE user_id < 10
),
spine AS (
    SELECT u.user_id, g.h
    FROM users u
    CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
                FROM bounds) g
),
hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS h,
           sum(CAST(value AS DECIMAL(18,4))) AS hour_sum
    FROM events WHERE user_id < 10
    GROUP BY 1, 2
)
SELECT s.user_id,
       strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(last_value(h.hour_sum IGNORE NULLS) OVER
         (PARTITION BY s.user_id ORDER BY s.h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled_sum,
       (h.hour_sum IS NULL) AS was_gap
FROM spine s LEFT JOIN hourly h ON h.user_id = s.user_id AND h.h = s.h
"""


@register(
    "gap_fill_forward",
    _GAP_FILL_ORACLE,
    doc="dense hour spine (sequence+explode) + left join + forward-fill "
    "(last_value IGNORE NULLS): timeseries resampling / hypertable "
    "gap-fill (SURVEY §2.5 ext)",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    small = ev.where(F.col("user_id") < 10)
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = (
        small.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    hourly = small.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(dec("value")).alias("hour_sum"))
    joined = spine.join(hourly, ["user_id", "h"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.last("hour_sum", ignorenulls=True).over(w).cast("double").alias("filled_sum"),
        F.col("hour_sum").isNull().alias("was_gap"),
    )


# ---------------------------------------------------------------------------
# SCD2-style history intervals (round-4 ext): each event becomes a
# validity interval [ts, next ts) per user — the slowly-changing-
# dimension type-2 layout every warehouse derives from a change
# stream. One window pass; the shuffle key (user_id) is the same as
# the downstream as-of join family, so the exchange is reusable.
# Microsecond-exact interval bounds on both engines.
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
SELECT user_id, event_id, value,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
       CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL AS BOOLEAN) AS is_current
FROM events
"""


@register(
    "scd2_event_history",
    _SCD2_ORACLE,
    doc="SCD2 validity intervals from a change stream: [ts, lead(ts)) per "
    "user, NULL-open current row (SURVEY §2.5 ext, r4)",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    nxt = F.lead("ts", 1).over(w)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.date_format("ts", fmt).alias("valid_from"),
        F.date_format(nxt, fmt).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Outlier fences + winsorization (round-4 ext): Tukey fences
# [q1 - 1.5·IQR, q3 + 1.5·IQR] per group, then outlier counts and a
# winsorized (clamped) sum — the numeric-feature cleaning step of a
# training pipeline. Determinism: quantiles at .25/.75 over the
# INTEGRAL l_quantity interpolate on binary fractions, so q1/q3 land
# on the exact .25 grid, the 1.5·IQR arithmetic stays on the .125
# grid, and every clamped value sums exactly in double. Plan: one
# skinny fence aggregate broadcast back onto the fact scan — two
# passes over the group, no row ever carries more than its own value.
# ---------------------------------------------------------------------------

_OUTLIER_FENCE_ORACLE = """
WITH fences AS (
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q1,
           quantile_cont(l_quantity, 0.75) AS q3
    FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       f.q1, f.q3,
       f.q1 - 1.5 * (f.q3 - f.q1) AS lo_fence,
       f.q3 + 1.5 * (f.q3 - f.q1) AS hi_fence,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN l.l_quantity < f.q1 - 1.5 * (f.q3 - f.q1)
                       OR l.l_quantity > f.q3 + 1.5 * (f.q3 - f.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       sum(greatest(f.q1 - 1.5 * (f.q3 - f.q1),
                    least(f.q3 + 1.5 * (f.q3 - f.q1), l.l_quantity)))
           AS winsorized_qty_sum
FROM lineitem l JOIN fences f ON l.l_returnflag = f.l_returnflag
GROUP BY l.l_returnflag, f.q1, f.q3
"""


@register(
    "feature_outlier_fences",
    _OUTLIER_FENCE_ORACLE,
    doc="Tukey-fence outlier counts + winsorized sum per group (numeric "
    "feature cleaning; binary-fraction quantiles keep bit parity) "
    "(SURVEY §2.8 ext, r4)",
)
def q_outlier_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    fences = li.groupBy("l_returnflag").agg(
        F.percentile(q, 0.25).alias("q1"),
        F.percentile(q, 0.75).alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    joined = li.join(F.broadcast(fences), "l_returnflag")
    return joined.groupBy("l_returnflag", "q1", "q3").agg(
        F.first(lo).alias("lo_fence"),
        F.first(hi).alias("hi_fence"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when((q < lo) | (q > hi), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_outliers"),
        F.sum(F.greatest(lo, F.least(hi, q))).alias("winsorized_qty_sum"),
    )


# ---------------------------------------------------------------------------
# Funnel analysis (round-4 ext): view → click → purchase conversion
# per user, ordered first-occurrence semantics (a stage counts only if
# its first event follows the previous stage's first event). One
# skinny per-user aggregate (min ts per stage) then a global rollup —
# two shuffles total, both on user_id/constants; the fact table is
# scanned once.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH firsts AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events
    GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS stage_view,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      AND t_purchase > t_click
                     THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
FROM firsts
"""


@register(
    "event_funnel_conversion",
    _FUNNEL_ORACLE,
    doc="view->click->purchase funnel with ordered first-occurrence "
    "semantics; one scan, skinny per-user stage aggregate "
    "(SURVEY §2.8 ext, r4)",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import load_table as _lt

    ev = _lt(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))

    def n(cond):
        return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("bigint")

    return firsts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        n(viewed).alias("stage_view"),
        n(clicked).alias("stage_click"),
        n(purchased).alias("stage_purchase"),
    )


# ---------------------------------------------------------------------------
# Cohort retention (round-4 ext): users grouped by signup week, then
# distinct-active counts at each week offset — the canonical retention
# matrix. Week truncation starts Monday in both engines; offsets are
# exact integer epoch arithmetic (no date formatting in the output, so
# no strftime-dialect hazard).
# ---------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH cohorts AS (
    SELECT user_id,
           date_trunc('week',
               min(CASE WHEN event_type = 'signup' THEN ts END)) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT CAST(c.cohort_week AS DATE) AS cohort_week,
       CAST((epoch(a.week) - epoch(c.cohort_week)) / 604800 AS BIGINT)
           AS week_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM cohorts c
JOIN activity a ON a.user_id = c.user_id
WHERE c.cohort_week IS NOT NULL AND a.week >= c.cohort_week
GROUP BY c.cohort_week, week_offset
"""


@register(
    "cohort_retention_weekly",
    _COHORT_ORACLE,
    doc="signup-week cohort retention matrix (distinct active users per "
    "week offset); exact integer epoch arithmetic, no date-format "
    "dialect in the output (SURVEY §2.8 ext, r4)",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc(
            "week", F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
        ).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    joined = (
        cohorts.where(F.col("cohort_week").isNotNull())
        .join(activity, "user_id")
        .where(F.col("week") >= F.col("cohort_week"))
    )
    offset = (
        (F.unix_timestamp("week") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("bigint")
    return joined.groupBy(
        F.col("cohort_week").cast("date").alias("cohort_week"),
        offset.alias("week_offset"),
    ).agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))


# ---------------------------------------------------------------------------
# OHLC resample (round-4 ext): tick stream → hourly candlesticks per
# event type — the reference domain's bar-building op. Open/close are
# deterministic via (ts, event_id) total order (Spark min_by/max_by on
# a struct key ≡ DuckDB ordered-aggregate first/last); volume is an
# exact decimal sum. One shuffle on the (hour, type) group key.
# ---------------------------------------------------------------------------

_OHLC_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar_hour,
       event_type,
       first(value ORDER BY ts, event_id) AS open_v,
       max(value) AS high_v,
       min(value) AS low_v,
       last(value ORDER BY ts, event_id) AS close_v,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS volume,
       CAST(count(*) AS BIGINT) AS n_ticks
FROM events
GROUP BY 1, 2
"""


@register(
    "ohlc_hourly_resample",
    _OHLC_ORACLE,
    doc="tick -> hourly OHLC candlesticks per event type; deterministic "
    "open/close via (ts, event_id) total order (SURVEY §2.8 ext, r4)",
)
def q_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import load_table as _lt
    from ..operators.aggregates import dec as _dec

    ev = _lt(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("bar_hour"), "event_type"
    ).agg(
        F.min_by("value", key).alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.max_by("value", key).alias("close_v"),
        F.sum(_dec("value")).cast("double").alias("volume"),
        F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
    )
