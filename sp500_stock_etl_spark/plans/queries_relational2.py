"""Second relational-extension batch (SURVEY.md §7.3): unpivot/melt,
Python UDTF (lateral table function), and hierarchical rollup
(pre-aggregated partials re-aggregated to a coarser grain — the
continuous-aggregate / hypertable-rollup pattern).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import udtf

from ..io.readers import load_table
from ..functions.rounding import round_half_up, sql_round
from ..operators.aggregates import dec
from .registry import register

# ---------------------------------------------------------------------------
# Unpivot (melt): wide → long. The inverse of pivot_event_counts.
# Map-side only — Expand produces k rows per input row with no
# shuffle; at 100 TB the k× fan-out happens inside the stage and
# any downstream agg sees it pre-combined.
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT o_orderkey, metric, val
FROM (
    SELECT o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(o_custkey AS DOUBLE) AS custkey
    FROM orders
    WHERE o_orderkey % 53 = 0
) UNPIVOT (val FOR metric IN (totalprice, custkey))
"""


@register(
    "unpivot_order_metrics",
    _UNPIVOT_ORACLE,
    doc="unpivot/melt wide→long, the inverse of pivot (SURVEY §2.8 ext); "
    "Expand node, zero shuffles",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 53 == 0
    )
    wide = orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return wide.unpivot(
        "o_orderkey", ["totalprice", "custkey"], "metric", "val"
    )


# ---------------------------------------------------------------------------
# Python UDTF: one input row → N output rows through a lateral join
# (SURVEY §2.12 ext — the table-function face of the UDF surface).
# Sentence splitting is deterministic string work, so the DuckDB
# lateral generate_series oracle checks it exactly. UDTFs run in the
# Python worker (Arrow-batched rows): keep them OFF the hot path —
# this exists to prove the plumbing (worker-side package import,
# lateral correlation, schema contract).
# ---------------------------------------------------------------------------

_SENTENCE_SEP = r"[.!?]+\s+"


@udtf(returnType="sentence_idx bigint, sentence string", useArrow=True)
class SplitSentences:
    def eval(self, text: str):
        if text is None:
            return
        for i, part in enumerate(re.split(_SENTENCE_SEP, text)):
            yield i + 1, part.strip()


_UDTF_ORACLE = rf"""
WITH parts AS (
    SELECT doc_id, string_split_regex(text, '{_SENTENCE_SEP}') AS ps
    FROM documents
    WHERE doc_id % 17 = 0
)
SELECT p.doc_id,
       i.i AS sentence_idx,
       trim(p.ps[CAST(i.i AS INT)]) AS sentence
FROM parts p, LATERAL (SELECT unnest(generate_series(1, len(p.ps))) AS i) i
"""


@register(
    "udtf_split_sentences",
    _UDTF_ORACLE,
    doc="Python UDTF in a lateral join: one doc → N sentence rows "
    "(SURVEY §2.12 ext); oracle via lateral generate_series",
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence
        FROM documents d, LATERAL split_sentences(d.text) s
        WHERE d.doc_id % 17 = 0
        """
    )


# ---------------------------------------------------------------------------
# Hierarchical rollup (continuous-aggregate pattern): daily metrics
# computed FROM the hourly aggregate, not from raw events. Decimal
# sums are associative, so sum-of-partial-sums is exactly the direct
# daily aggregate — which is what the oracle computes, proving the
# rollup lattice is lossless. At 100 TB this is how dashboards stay
# interactive: materialize the fine grain once, serve every coarser
# grain from it (events → hour is the only full-data pass).
# ---------------------------------------------------------------------------

_HIER_ROLLUP_ORACLE = """
SELECT CAST(strftime(ts, '%Y-%m-%d') AS DATE) AS day,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register(
    "hierarchical_rollup_daily",
    _HIER_ROLLUP_ORACLE,
    doc="daily aggregate computed from hourly partials (continuous-"
    "aggregate / hypertable rollup); decimal sums make the lattice "
    "lossless — oracle aggregates raw events directly (SURVEY §2.8 ext)",
)
def q_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).alias("sum_value"),
    )
    return hourly.groupBy(
        F.to_date("hour").alias("day"), "event_type"
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").cast("decimal(18,4)").cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Outer joins (the remaining join shapes): left-outer enrichment with
# null-fill, and full-outer reconciliation between two aggregates —
# the canonical "compare two pipelines' outputs" query. Both shuffle
# on the join key like any equi-join; the outer sides just keep
# unmatched rows, so cardinality is max(|A|,|B|), not |A∩B|.
# ---------------------------------------------------------------------------

_LEFT_OUTER_ORACLE = """
SELECT c.c_custkey,
       c.c_mktsegment,
       COALESCE(o.n_orders, 0) AS n_orders
FROM customer c
LEFT JOIN (
    SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
) o ON o.o_custkey = c.c_custkey
"""


@register(
    "left_outer_enrichment",
    _LEFT_OUTER_ORACLE,
    doc="left-outer join with null-fill: every customer kept, zero-order "
    "customers get 0 (SURVEY §2.9 ext)",
)
def q_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return cust.join(
        counts, cust.c_custkey == counts.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
    )


_FULL_OUTER_ORACLE = """
WITH before AS (
    SELECT o_custkey, count(*) AS n_before FROM orders
    WHERE o_orderdate < DATE '1997-01-01' GROUP BY o_custkey
),
after AS (
    SELECT o_custkey, count(*) AS n_after FROM orders
    WHERE o_orderdate >= DATE '1997-01-01' GROUP BY o_custkey
)
SELECT COALESCE(b.o_custkey, a.o_custkey) AS custkey,
       COALESCE(b.n_before, 0) AS n_before,
       COALESCE(a.n_after, 0) AS n_after
FROM before b FULL OUTER JOIN after a ON b.o_custkey = a.o_custkey
"""


@register(
    "full_outer_reconciliation",
    _FULL_OUTER_ORACLE,
    doc="full-outer reconciliation of two aggregates (customers active "
    "only before / only after / both) (SURVEY §2.9 ext)",
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("date")
    before = (
        orders.where(F.to_date("o_orderdate") < cutoff)
        .groupBy(F.col("o_custkey").alias("b_key"))
        .agg(F.count(F.lit(1)).alias("n_before"))
    )
    after = (
        orders.where(F.to_date("o_orderdate") >= cutoff)
        .groupBy(F.col("o_custkey").alias("a_key"))
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    return before.join(
        after, before.b_key == after.a_key, "full_outer"
    ).select(
        F.coalesce(F.col("b_key"), F.col("a_key")).alias("custkey"),
        F.coalesce(F.col("n_before"), F.lit(0)).alias("n_before"),
        F.coalesce(F.col("n_after"), F.lit(0)).alias("n_after"),
    )


# ---------------------------------------------------------------------------
# Null-safe equality (<=> / IS NOT DISTINCT FROM): NULL keys match
# each other instead of disappearing — the semantic SQL inner joins
# silently drop. Derived nullable key on both sides so the NULL
# bucket is exercised.
# ---------------------------------------------------------------------------

_NULL_SAFE_ORACLE = """
WITH l AS (
    SELECT n_name AS l_name,
           CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END AS k
    FROM nation
),
r AS (
    SELECT n_name AS r_name,
           CASE WHEN n_regionkey = 2 THEN NULL ELSE n_regionkey END AS k
    FROM nation
)
SELECT l.l_name, r.r_name
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
"""


@register(
    "null_safe_join",
    _NULL_SAFE_ORACLE,
    doc="null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL "
    "bucket matches itself (SURVEY §2.9 ext)",
)
def q_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    key = F.when(F.col("n_regionkey") == 2, F.lit(None)).otherwise(
        F.col("n_regionkey")
    )
    left = nation.select(F.col("n_name").alias("l_name"), key.alias("lk"))
    right = nation.select(F.col("n_name").alias("r_name"), key.alias("rk"))
    return left.join(
        right, left.lk.eqNullSafe(right.rk)
    ).select("l_name", "r_name")


# ---------------------------------------------------------------------------
# MapType surface: parse the JSON props into a real map<string,bigint>,
# explode its entries, aggregate per key — the generic form of
# json_props_agg (which extracts one known field). The map explode is
# a generator (map-side); only the per-key agg shuffles.
# ---------------------------------------------------------------------------

_MAP_FUNC_ORACLE = """
SELECT json_keys(props)[1] AS key,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$."' || json_keys(props)[1] || '"')
                AS BIGINT)) AS BIGINT) AS sum_v
FROM events
GROUP BY 1
"""


@register(
    "map_entries_agg",
    _MAP_FUNC_ORACLE,
    doc="from_json → map<string,bigint> → explode entries → per-key agg "
    "(SURVEY §2.10 ext, MapType surface)",
)
def q_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,bigint>")).alias(
            "key", "value"
        )
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_v"),
    )


# ---------------------------------------------------------------------------
# Array / higher-order function suite over the embedding vectors:
# size, element max, lambda filter, sort+slice, and a left-to-right
# aggregate fold — every expression a native Catalyst HOF (zero UDFs),
# each with its exact DuckDB list-function twin. Floats pass through
# or fold in identical order, so parity is bitwise.
# ---------------------------------------------------------------------------

_ARRAY_FUNC_ORACLE = """
SELECT vec_id,
       len(embedding) AS dim,
       CAST(list_max(embedding) AS DOUBLE) AS vmax,
       CAST(list_filter(embedding, x -> x > 0)[1] AS DOUBLE) AS first_positive,
       CAST(list_sort(embedding)[1] AS DOUBLE) AS smallest1,
       CAST(list_sort(embedding)[2] AS DOUBLE) AS smallest2,
       CAST(list_sort(embedding)[3] AS DOUBLE) AS smallest3,
       list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vsum
FROM embeddings
WHERE vec_id % 7 = 0
"""


@register(
    "array_functions_suite",
    _ARRAY_FUNC_ORACLE,
    doc="higher-order array functions (size/max/filter/sort+element/fold) "
    "with bitwise DuckDB list parity; the sorted prefix is projected as "
    "three scalar double columns so the external driver's canonicalizer "
    "(which cannot hash list cells) sees only scalars — float32→double "
    "widening is exact on both engines (SURVEY §2.10 ext)",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % 7 == 0
    )
    vec = F.col("embedding")
    srt = F.sort_array(vec)
    return emb.select(
        "vec_id",
        F.size(vec).cast("bigint").alias("dim"),
        F.array_max(vec).cast("double").alias("vmax"),
        F.element_at(F.filter(vec, lambda x: x > 0), 1)
        .cast("double")
        .alias("first_positive"),
        F.element_at(srt, 1).cast("double").alias("smallest1"),
        F.element_at(srt, 2).cast("double").alias("smallest2"),
        F.element_at(srt, 3).cast("double").alias("smallest3"),
        F.aggregate(
            vec, F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ).alias("vsum"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): a data-driven calendar
# spine — every year between min and max order date, zero-filled via
# left join. One dialect-portable SQL text is both the query and the
# oracle. The recursion depth is the year span (tiny, driver-side
# iterations); the per-iteration work is distributed as usual.
# ---------------------------------------------------------------------------

_RECURSIVE_SQL = """
WITH RECURSIVE bounds AS (
    SELECT CAST(min(year(o_orderdate)) AS INT) AS lo,
           CAST(max(year(o_orderdate)) AS INT) AS hi
    FROM orders
),
years(y) AS (
    SELECT lo FROM bounds
    UNION ALL
    SELECT y + 1 FROM years WHERE y < (SELECT hi FROM bounds)
),
per_year AS (
    SELECT CAST(year(o_orderdate) AS INT) AS yy, count(*) AS n
    FROM orders GROUP BY 1
)
SELECT y AS order_year, COALESCE(n, 0) AS n_orders
FROM years LEFT JOIN per_year ON y = yy
"""


@register(
    "recursive_cte_calendar",
    _RECURSIVE_SQL,
    doc="WITH RECURSIVE calendar spine + zero-filled counts (Spark 4 "
    "recursion; portable SQL is query and oracle) (SURVEY §7.3 ext)",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


# ---------------------------------------------------------------------------
# VARIANT (Spark 4 semi-structured type): parse the JSON props ONCE
# into the binary variant encoding, then extract typed paths — at
# 100 TB this replaces per-expression string re-parsing (the
# map/regexp approaches above) with a single decode and cheap typed
# access. Values come out identical to the JSON-path oracle.
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(props->>'$.k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


@register(
    "variant_json_agg",
    _VARIANT_ORACLE,
    doc="parse_json -> VARIANT -> typed path extraction + agg (Spark 4 "
    "semi-structured fast path; SURVEY §2.10 ext)",
)
def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Six-table star-chain join (TPC-H Q5 shape): region filter prunes
# nation -> customer -> orders -> lineitem -> supplier, with the
# local-supply predicate (customer and supplier share a nation).
# This is the optimizer workout: CBO orders the joins, the three
# dims broadcast, and only the orders<->lineitem edge shuffles.
# Revenue sums in decimal for cross-partition determinism.
# ---------------------------------------------------------------------------

_STAR_CHAIN_ORACLE = """
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
           * CAST(1.0 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@register(
    "star_chain_q5",
    _STAR_CHAIN_ORACLE,
    doc="TPC-H Q5-shaped 6-table join with local-supply predicate; CBO "
    "join ordering + dim broadcasts, one fact shuffle (SURVEY §2.9 ext)",
)
def q_star_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,4)")
    joined = (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# Percent-of-total (ratio_to_report): a windowed sum over the whole
# partition feeding a single double division — the share-of-segment
# report. The decimal windowed sum keeps the denominator
# deterministic; the division is one IEEE op with identical operands
# in both engines.
# ---------------------------------------------------------------------------

_PCT_TOTAL_ORACLE = """
WITH seg AS (
    SELECT c_mktsegment,
           sum(CAST(c_acctbal AS DECIMAL(18,4))) AS seg_bal,
           count(*) AS n_cust
    FROM customer
    GROUP BY c_mktsegment
)
SELECT c_mktsegment, CAST(seg_bal AS DOUBLE) AS seg_bal, n_cust,
       CAST(seg_bal AS DOUBLE)
         / CAST(sum(seg_bal) OVER () AS DOUBLE) AS share_of_total
FROM seg
"""


@register(
    "percent_of_total",
    _PCT_TOTAL_ORACLE,
    doc="ratio-to-report via whole-partition window over a pre-aggregate "
    "(SURVEY §2.5 ext)",
)
def q_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cust = load_table(spark, sf_dir, "customer")
    seg = cust.groupBy("c_mktsegment").agg(
        F.sum(dec("c_acctbal")).alias("seg_bal"),
        F.count(F.lit(1)).alias("n_cust"),
    )
    total = F.sum("seg_bal").over(
        W.partitionBy().rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )
    )
    return seg.select(
        "c_mktsegment",
        F.col("seg_bal").cast("double").alias("seg_bal"),
        "n_cust",
        (F.col("seg_bal").cast("double") / total.cast("double")).alias(
            "share_of_total"
        ),
    )


# ---------------------------------------------------------------------------
# Weighted average: sum(w*x)/sum(w), both sums in decimal. The
# numerator's scaled value exceeds 2^53, so each engine's
# decimal->double conversion can round the last ulp differently —
# the quotient is therefore quantized through the shared half-up
# kernel (6 decimals) on both sides, the same policy as every other
# rounded column (SURVEY §7.5.1/.3).
# ---------------------------------------------------------------------------

_WA_EXPR = (
    "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))"
    " * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)"
    " / CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)"
)

_WEIGHTED_AVG_ORACLE = f"""
SELECT l_returnflag,
       {sql_round(_WA_EXPR, 6)} AS qty_weighted_price
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "weighted_avg_pricing",
    _WEIGHTED_AVG_ORACLE,
    doc="weighted average with exact decimal numerator/denominator "
    "(SURVEY §2.8 ext)",
)
def q_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    num = F.sum(dec("l_quantity") * dec("l_extendedprice"))
    den = F.sum(dec("l_quantity"))
    return li.groupBy("l_returnflag").agg(
        round_half_up(num.cast("double") / den.cast("double"), 6).alias(
            "qty_weighted_price"
        )
    )


# ---------------------------------------------------------------------------
# Money-typed twin of weighted_avg_pricing (round-3 verdict item 8):
# the SURVEY §7.4 decimal-at-scale policy applied to the ratio family.
# Per-column decision: qty (2 real dp) and price (2 real dp) carry
# DECIMAL(18,4); their product is exact at 4 dp and is held at
# DECIMAL(24,8) so the SUM — decimal, associative, fold-order-free —
# is exact on any partitioning. The RATIO itself is deliberately NOT
# emitted as decimal: decimal division scale/rounding is the one spot
# where engines legitimately disagree (Spark picks quotient scale by
# its own promotion rule, DuckDB by another), so the auditable exact
# artifacts are numerator + denominator, and ratio consumers divide in
# double (weighted_avg_pricing above) or in their ledger system.
# ---------------------------------------------------------------------------

_WEIGHTED_AVG_DECIMAL_ORACLE = """
SELECT l_returnflag,
       CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,4))
                          * CAST(l_extendedprice AS DECIMAL(18,4))
                          AS DECIMAL(24,8))) AS DECIMAL(38,8)) AS STRING)
           AS sum_qty_price_dec,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS STRING)
           AS sum_qty_dec,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "weighted_avg_pricing_decimal",
    _WEIGHTED_AVG_DECIMAL_ORACLE,
    doc="money-typed weighted-average twin: exact decimal numerator + "
    "denominator, canonical decimal-string comparison; ratio left to "
    "double-space consumers (SURVEY §7.4, round-3 verdict item 8)",
)
def q_weighted_avg_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty_price = (dec("l_quantity") * dec("l_extendedprice")).cast("decimal(24,8)")
    return li.groupBy("l_returnflag").agg(
        F.sum(qty_price).cast("decimal(38,8)").cast("string").alias("sum_qty_price_dec"),
        F.sum(dec("l_quantity")).cast("decimal(28,4)").cast("string").alias("sum_qty_dec"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped subquery batch (SURVEY §4.1 / §7.3 ext): the four
# decorrelation patterns the first batch did not cover — EXISTS under
# an aggregate (Q4), an outer join with a filtered ON clause feeding a
# count histogram (Q13), HAVING against a global scalar subquery
# (Q11), and NOT EXISTS plus a cross-multiplied global threshold
# (Q22). One dialect-portable SQL text is both the query and its
# oracle. Cross-engine determinism notes: sum(l_quantity) is exact
# (integral doubles far below 2^53); the Q22 threshold avoids avg()
# (whose double sum is fold-order-dependent) by cross-multiplying an
# exact decimal sum; non-representable fraction literals are pinned
# with CAST(... AS DOUBLE).
# ---------------------------------------------------------------------------

_TPCH_Q4_SQL = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > l.l_tax)
GROUP BY o.o_orderpriority
"""


@register(
    "tpch_q4_priority_exists",
    _TPCH_Q4_SQL,
    doc="TPC-H Q4 shape: EXISTS decorrelated to a left-semi join under a "
    "grouped count; portable SQL text is query and oracle (SURVEY §4.1)",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q4_SQL)


_TPCH_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey AS custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
"""


@register(
    "tpch_q13_custdist",
    _TPCH_Q13_SQL,
    doc="TPC-H Q13 shape: left outer join with a filtered ON clause (the "
    "filter must NOT drop unmatched customers), two-level aggregation "
    "into a count histogram (SURVEY §2.9 ext)",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q13_SQL)


_TPCH_Q11_SQL = """
SELECT l_partkey, CAST(sum(l_quantity) AS DOUBLE) AS part_qty
FROM lineitem
GROUP BY l_partkey
HAVING sum(l_quantity) >
       (SELECT sum(l_quantity) / count(DISTINCT l_partkey) FROM lineitem)
         * CAST(1.2 AS DOUBLE)
"""


@register(
    "tpch_q11_important_parts",
    _TPCH_Q11_SQL,
    doc="TPC-H Q11 shape: HAVING against an uncorrelated global scalar "
    "subquery (planned as a broadcast of one row, not a rescan); exact "
    "because quantity sums are integral doubles (SURVEY §4.1)",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q11_SQL)


_TPCH_Q22_SQL = """
SELECT c.c_mktsegment,
       count(*) AS n_cust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
WHERE CAST(c.c_acctbal AS DECIMAL(18,2))
        * (SELECT count(*) FROM customer c3 WHERE c3.c_acctbal > 0)
      > (SELECT sum(CAST(c2.c_acctbal AS DECIMAL(18,2)))
         FROM customer c2 WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
"""


@register(
    "tpch_q22_idle_segments",
    _TPCH_Q22_SQL,
    doc="TPC-H Q22 shape: NOT EXISTS anti-join plus an above-average "
    "threshold done as an exact decimal cross-multiplication (avg() over "
    "doubles is fold-order-dependent across engines) (SURVEY §4.1)",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q22_SQL)


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-column predicates across a join —
# the classic optimizer test for OR-predicate handling (each branch
# constrains BOTH sides, so the engine must push the union of the
# part-side constraints below the join instead of evaluating the OR
# only post-join). Revenue goes through the shared half-up kernel +
# decimal sum (terminal DOUBLE) for cross-engine bitwise parity.
# ---------------------------------------------------------------------------

_Q19_REV = sql_round("l.l_extendedprice * (1 - l.l_discount)", 2)

_TPCH_Q19_SQL = f"""
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST({_Q19_REV} AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 45
       AND l.l_quantity BETWEEN 20 AND 30)
GROUP BY p.p_brand
"""


@register(
    "tpch_q19_disjunctive_join",
    _TPCH_Q19_SQL,
    doc="TPC-H Q19 shape: three OR'd brand/size/quantity predicate groups "
    "across a lineitem×part join — exercises disjunctive predicate "
    "pushdown; portable SQL text is query and oracle (SURVEY §4.1)",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q19_SQL)


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: the classic reporting query — revenue lost to
# returned items per customer over a quarter, customer×orders×lineitem
# ×nation multi-join, grouped, ranked, top-k. Deterministic total
# order (revenue DESC would tie on equal revenues; the unique custkey
# breaks it) so LIMIT is stable across engines.
# ---------------------------------------------------------------------------

_Q10_REV = sql_round("l.l_extendedprice * (1 - l.l_discount)", 2)

_TPCH_Q10_SQL = f"""
SELECT c.c_custkey,
       c.c_mktsegment,
       n.n_name,
       CAST(sum(CAST({_Q10_REV} AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_mktsegment, n.n_name
ORDER BY sum(CAST({_Q10_REV} AS DECIMAL(18,2))) DESC, c.c_custkey
LIMIT 20
"""


@register(
    "tpch_q10_returned_items",
    _TPCH_Q10_SQL,
    doc="TPC-H Q10 shape: 4-table join, grouped returned-item revenue, "
    "top-20 under a tie-broken total order; portable SQL text is query "
    "and oracle (SURVEY §4.1)",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q10_SQL)


# ---------------------------------------------------------------------------
# TPC-H decorrelation batch 3 (round 4): the remaining classic
# optimizer shapes — Q15 (agg view + scalar-max equality), Q17
# (correlated scalar avg subquery against the outer row), Q18 (IN over
# a grouped HAVING subquery), Q21 (EXISTS + NOT EXISTS both correlated
# to the same fact, adapted to this schema's lateness predicate since
# the synthetic lineitem has no commit/receipt dates). One portable
# SQL text per query is both the Spark plan (spark.sql) and the DuckDB
# oracle. Determinism: every money sum goes through exact
# DECIMAL(18,4) before its terminal DOUBLE cast; quantity sums are
# integral doubles cast BIGINT; avg() operands are integral so the
# double sum is fold-order-free below 2^53.
# ---------------------------------------------------------------------------

_TPCH_Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                         * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                         AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register(
    "tpch_q15_top_supplier",
    _TPCH_Q15_SQL,
    doc="TPC-H Q15 shape: aggregated revenue view + scalar-max equality "
    "(exact-decimal revenue so the max tie is engine-stable) (SURVEY §4.1)",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q15_SQL)


_TPCH_Q17_SQL = """
SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
            / CAST(7.0 AS DOUBLE) AS DOUBLE) AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND p.p_size < 15
  AND l.l_quantity < (
      SELECT 0.2 * avg(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


@register(
    "tpch_q17_small_quantity",
    _TPCH_Q17_SQL,
    doc="TPC-H Q17 shape: correlated scalar avg subquery on the probe's own "
    "part — small-quantity revenue (avg over integral doubles is "
    "fold-order-free) (SURVEY §4.1)",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q17_SQL)


_TPCH_Q18_SQL = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS o_odate,
       o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CAST(l_quantity AS BIGINT)) > 300
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@register(
    "tpch_q18_large_orders",
    _TPCH_Q18_SQL,
    doc="TPC-H Q18 shape: IN over a grouped-HAVING subquery feeding a "
    "three-way join rollup (large-volume customers) (SURVEY §4.1)",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q18_SQL)


_TPCH_Q21_SQL = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
  )
GROUP BY s.s_name
"""


@register(
    "tpch_q21_waiting_supplier",
    _TPCH_Q21_SQL,
    doc="TPC-H Q21 shape: EXISTS + NOT EXISTS both correlated to the same "
    "fact (sole-late-supplier in multi-supplier orders; lateness adapted to "
    "l_shipdate vs o_orderdate — this schema has no commit/receipt dates) "
    "(SURVEY §4.1)",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q21_SQL)


# ---------------------------------------------------------------------------
# TPC-H batch 4 (round 4): the remaining shapes expressible on this
# schema — Q2 (correlated min across a 4-table dimension chain), Q7
# (nation-pair volume), Q8 (market share ratio), Q14 (promo revenue
# share), Q16 (distinct-supplier counts with a NOT IN exclusion), Q20
# (IN over a correlated HAVING threshold). The schema has no partsupp
# table and no commit/receipt/shipmode columns, so Q2/Q16/Q20 use the
# lineitem-derived part↔supplier link, and Q9/Q12 (round 5, below)
# derive ps_supplycost / shipmode / commit+receipt dates
# deterministically from existing key columns — the same integer
# arithmetic on both engines, documented at each query. Money math
# follows the decimal policy; ratio thresholds are integer
# cross-multiplied.
# ---------------------------------------------------------------------------

_TPCH_Q2_SQL = """
WITH costs AS (
    SELECT l_partkey, l_suppkey,
           min(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DOUBLE)
               / CAST(l_quantity AS DOUBLE)) AS unit_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, c.unit_cost
FROM part p
JOIN costs c ON c.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = c.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE' AND p.p_size < 10
  AND c.unit_cost = (
      SELECT min(c2.unit_cost)
      FROM costs c2
      JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      WHERE c2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
"""


@register(
    "tpch_q2_min_cost_supplier",
    _TPCH_Q2_SQL,
    doc="TPC-H Q2 shape: correlated min across a 4-table dimension chain "
    "(unit cost derived from lineitem; schema has no partsupp) "
    "(SURVEY §4.1)",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q2_SQL)


_TPCH_Q7_SQL = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                     * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
"""


@register(
    "tpch_q7_nation_volume",
    _TPCH_Q7_SQL,
    doc="TPC-H Q7 shape: bilateral nation-pair shipping volume by year "
    "(SURVEY §4.1)",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q7_SQL)


_TPCH_Q8_SQL = """
WITH volumes AS (
    SELECT year(o.o_orderdate) AS o_year,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS volume,
           sn.n_name AS supp_nation
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = cn.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(sum(volume) AS DOUBLE) AS mkt_share
FROM volumes
GROUP BY o_year
"""


@register(
    "tpch_q8_market_share",
    _TPCH_Q8_SQL,
    doc="TPC-H Q8 shape: one nation's market share of a part-type market "
    "by year (decimal num/den, one double division) (SURVEY §4.1)",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q8_SQL)


_TPCH_Q14_SQL = """
SELECT CAST(100.0 AS DOUBLE)
       * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                       THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                                 * (CAST(1 AS DECIMAL(18,4))
                                    - CAST(l.l_discount AS DECIMAL(18,4)))
                                 AS DECIMAL(18,4))
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                       * (CAST(1 AS DECIMAL(18,4))
                          - CAST(l.l_discount AS DECIMAL(18,4)))
                       AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
"""


@register(
    "tpch_q14_promo_share",
    _TPCH_Q14_SQL,
    doc="TPC-H Q14 shape: promo revenue share of a month (conditional "
    "decimal sums, one double division) (SURVEY §4.1)",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q14_SQL)


_TPCH_Q16_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register(
    "tpch_q16_supplier_counts",
    _TPCH_Q16_SQL,
    doc="TPC-H Q16 shape: distinct-supplier counts per part attribute with "
    "a NOT IN exclusion subquery (null-aware anti join) (SURVEY §4.1)",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q16_SQL)


_TPCH_Q20_SQL = """
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'red%'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(CAST(l.l_quantity AS BIGINT)) * 5 > (
          SELECT sum(CAST(l2.l_quantity AS BIGINT))
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
  )
"""


@register(
    "tpch_q20_excess_share_supplier",
    _TPCH_Q20_SQL,
    doc="TPC-H Q20 shape: IN over a grouped HAVING with a correlated "
    "scalar-agg threshold (integer cross-multiplied 20% share; schema "
    "has no partsupp availqty) (SURVEY §4.1)",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q20_SQL)


# ---------------------------------------------------------------------------
# TPC-H batch 5 (round 5): Q9 and Q12, closing the suite at 22/22.
# The testdata schema has no partsupp table and no shipmode /
# commitdate / receiptdate columns, so both queries DERIVE the missing
# inputs deterministically from existing key columns with integer
# arithmetic both engines compute bit-identically:
#   Q9  ps_supplycost := (100 + (l_partkey*7 + l_suppkey*13) % 900)
#       cents — i.e. $1.00..$9.99, a pure function of the natural
#       partsupp key, applied as integer cents * DECIMAL 0.01 so no
#       decimal division ever happens.
#   Q12 l_shipmode := 7-way CASE over (l_orderkey*11 + l_linenumber)%7;
#       l_commitdate/l_receiptdate := l_shipdate + (1 + hash%60) days
#       with different multipliers, so commit<receipt holds for ~half
#       the lines, exactly like the real columns would.
# The derivations are part of the query text (documented, reproducible)
# — the point is the SHAPE: Q9's 5-way join profit rollup, Q12's
# two-branch conditional count on a date sandwich.
# ---------------------------------------------------------------------------

_TPCH_Q9_SQL = """
WITH profit AS (
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4))
                   - CAST(l.l_discount AS DECIMAL(18,4)))
                AS DECIMAL(18,4))
           - CAST(CAST((100 + (l.l_partkey * 7 + l.l_suppkey * 13) % 900)
                       * CAST(l.l_quantity AS BIGINT) AS DECIMAL(18,4))
                  * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(18,4)) AS amount
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%bolt%'
)
SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
FROM profit
GROUP BY nation, o_year
"""


@register(
    "tpch_q9_profit",
    _TPCH_Q9_SQL,
    doc="TPC-H Q9 shape: product-profit by nation x order-year across a "
    "5-way join; ps_supplycost derived as integer cents from the natural "
    "(partkey, suppkey) key (schema has no partsupp), revenue minus cost "
    "in exact decimals, one terminal double cast (SURVEY §4.1)",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q9_SQL)


_TPCH_Q12_ORACLE = """
WITH li AS (
    SELECT l_orderkey,
           CASE (l_orderkey * 11 + l_linenumber) % 7
                WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'AIR'
                WHEN 3 THEN 'RAIL' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'FOB'
                ELSE 'REG AIR' END AS l_shipmode,
           CAST(l_shipdate AS DATE) AS ship_d,
           CAST(l_shipdate AS DATE)
               + CAST(1 + (l_orderkey * 3 + l_linenumber * 7) % 60 AS INT)
               AS commit_d,
           CAST(l_shipdate AS DATE)
               + CAST(1 + (l_orderkey * 5 + l_linenumber * 11) % 60 AS INT)
               AS receipt_d
    FROM lineitem
)
SELECT l_shipmode,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
WHERE l_shipmode IN ('MAIL', 'SHIP')
  AND commit_d < receipt_d
  AND ship_d < commit_d
  AND receipt_d >= DATE '1997-01-01'
  AND receipt_d < DATE '1998-01-01'
GROUP BY l_shipmode
"""


@register(
    "tpch_q12_shipmode",
    _TPCH_Q12_ORACLE,
    doc="TPC-H Q12 shape: two-branch priority counts on a "
    "commit<receipt date sandwich; shipmode and both dates derived "
    "deterministically from (orderkey, linenumber, shipdate) — the "
    "Spark side uses date_add with a column offset, the oracle DuckDB's "
    "date+int arithmetic, same integer day offsets (SURVEY §4.1)",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ship = F.col("l_shipdate").cast("date")
    mode_idx = (F.col("l_orderkey") * 11 + F.col("l_linenumber")) % 7
    commit_off = (
        F.lit(1) + (F.col("l_orderkey") * 3 + F.col("l_linenumber") * 7) % 60
    ).cast("int")
    receipt_off = (
        F.lit(1) + (F.col("l_orderkey") * 5 + F.col("l_linenumber") * 11) % 60
    ).cast("int")
    modes = ["MAIL", "SHIP", "AIR", "RAIL", "TRUCK", "FOB", "REG AIR"]
    mode_col = F.element_at(
        F.array(*[F.lit(m) for m in modes]), (mode_idx + 1).cast("int")
    )
    derived = li.select(
        "l_orderkey",
        mode_col.alias("l_shipmode"),
        ship.alias("ship_d"),
        F.date_add(ship, commit_off).alias("commit_d"),
        F.date_add(ship, receipt_off).alias("receipt_d"),
    ).where(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("commit_d") < F.col("receipt_d"))
        & (F.col("ship_d") < F.col("commit_d"))
        & (F.col("receipt_d") >= F.lit("1997-01-01").cast("date"))
        & (F.col("receipt_d") < F.lit("1998-01-01").cast("date"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        derived.join(orders, derived.l_orderkey == orders.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )
