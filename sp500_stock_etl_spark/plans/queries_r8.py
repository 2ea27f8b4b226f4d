"""Round-8 additions — TPC-DS batch 3: the set-operator shapes the
suite still lacked (r7 verdict item 5).

The repo has a generic set-ops exhibit (queries_extensions.py
set_ops_cohorts) but no TPC-shaped INTERSECT/EXCEPT-under-aggregation
composition. These three follow the TPC batch convention: portable
ANSI SQL text is BOTH the Spark query (spark.sql over registered
views) and the DuckDB oracle, so the engines execute the identical
statement.

Scale notes (the set-op execution story at 100 TB):
- Spark plans INTERSECT/EXCEPT DISTINCT as left-semi / left-anti
  joins over aggregated (distinct) children — each child dedups
  map-side first, so the shuffle carries distinct keys, not raw rows;
- the INTERSECT chain keys on (user_id, day) / item keys — the
  same partitioning reused across branches under AQE;
- Q14's "above channel average" filter is EXACT integer/decimal
  arithmetic (rev * n > total), never a float average in a predicate
  — float-sum order dependence would make the survivor set
  nondeterministic across engines at the boundary.

Reference scope: the reference DAG (dags/sp500_dag.py.py) has no
set operators at all; this family extends SURVEY.md §2.10's relational
completeness the same way the TPC-H and earlier TPC-DS batches did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io.readers import register_views
from .registry import register

# ---------------------------------------------------------------------------
# TPC-DS Q38 shape — distinct-entity census via INTERSECT: entities
# active in ALL THREE channels in the window. Q38 intersects
# (customer, date) across store/catalog/web sales; here the three
# channels are the view/click/purchase event streams and the entity
# is (user_id, day). Single-row count, like the original.
# ---------------------------------------------------------------------------

_TPCDS_Q38_SQL = """
WITH v AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
    FROM events WHERE event_type = 'view'
),
c AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
    FROM events WHERE event_type = 'click'
),
p AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
    FROM events WHERE event_type = 'purchase'
)
SELECT CAST(count(*) AS BIGINT) AS hot_count
FROM (
    SELECT user_id, d FROM v
    INTERSECT
    SELECT user_id, d FROM c
    INTERSECT
    SELECT user_id, d FROM p
) t
"""


@register(
    "tpcds_q38_channel_intersect",
    _TPCDS_Q38_SQL,
    doc="TPC-DS Q38 shape: three-channel distinct (user, day) census "
    "chained with INTERSECT — planned as semi-joins over pre-"
    "deduplicated children; portable SQL text is query and oracle (r8)",
)
def q_tpcds_q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_TPCDS_Q38_SQL)


# ---------------------------------------------------------------------------
# TPC-DS Q87 shape — the EXCEPT twin: entities in the first channel
# and in NEITHER of the other two (Q87 counts store customers absent
# from catalog and web). EXCEPT DISTINCT plans as left-anti joins.
# ---------------------------------------------------------------------------

_TPCDS_Q87_SQL = """
WITH v AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
    FROM events WHERE event_type = 'view'
),
c AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
    FROM events WHERE event_type = 'click'
),
p AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
    FROM events WHERE event_type = 'purchase'
)
SELECT CAST(count(*) AS BIGINT) AS exclusive_count
FROM (
    SELECT user_id, d FROM v
    EXCEPT
    SELECT user_id, d FROM c
    EXCEPT
    SELECT user_id, d FROM p
) t
"""


@register(
    "tpcds_q87_channel_except",
    _TPCDS_Q87_SQL,
    doc="TPC-DS Q87 shape: (user, day) present in the view channel and "
    "absent from click AND purchase via chained EXCEPT — planned as "
    "anti-joins over deduplicated children; portable SQL text is "
    "query and oracle (r8)",
)
def q_tpcds_q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_TPCDS_Q87_SQL)


# ---------------------------------------------------------------------------
# TPC-DS Q14 shape — cross-channel frequent items: items whose
# channel revenue beats that channel's average item revenue in EVERY
# channel (INTERSECT under aggregation), then the per-channel /
# per-brand sales report restricted to those items. Channels are the
# three l_returnflag slices (each covers the full part range, so the
# above-average filter is what makes the intersection selective —
# Q14's avg_sales device). The average comparison is EXACT:
# rev * channel_item_count > channel_total_revenue in decimal
# arithmetic, so the survivor set is bit-deterministic cross-engine.
# ---------------------------------------------------------------------------

_TPCDS_Q14_SQL = """
WITH item_rev AS (
    SELECT l_returnflag AS channel, l_partkey,
           sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
    FROM lineitem
    GROUP BY l_returnflag, l_partkey
),
chan_tot AS (
    SELECT channel,
           count(*) AS n_items_ch,
           sum(rev) AS tot
    FROM item_rev
    GROUP BY channel
),
hot AS (
    SELECT ir.channel, ir.l_partkey
    FROM item_rev ir JOIN chan_tot ct ON ir.channel = ct.channel
    WHERE ir.rev * ct.n_items_ch > ct.tot
),
cross_items AS (
    SELECT l_partkey FROM hot WHERE channel = 'A'
    INTERSECT
    SELECT l_partkey FROM hot WHERE channel = 'N'
    INTERSECT
    SELECT l_partkey FROM hot WHERE channel = 'R'
)
SELECT ir.channel, p.p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(ir.rev) AS DOUBLE) AS revenue
FROM item_rev ir
JOIN cross_items ci ON ir.l_partkey = ci.l_partkey
JOIN part p ON p.p_partkey = ir.l_partkey
GROUP BY ir.channel, p.p_brand
"""


@register(
    "tpcds_q14_cross_channel_items",
    _TPCDS_Q14_SQL,
    doc="TPC-DS Q14 shape: above-channel-average items intersected "
    "across all three channels (INTERSECT under aggregation, exact "
    "decimal threshold — no float average in a predicate), then the "
    "per-channel per-brand report over the surviving items; portable "
    "SQL text is query and oracle (r8)",
)
def q_tpcds_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_TPCDS_Q14_SQL)


# ---------------------------------------------------------------------------
# Late-r8 additions beyond the verdict items: three genuinely-new
# capabilities (model-inference-as-Catalyst, mixture allocation,
# UNPIVOT) — each a first for the registry, each fully oracle-checked.
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from ..functions.text import STOPWORDS, norm_text, sql_norm_text  # noqa: E402
from ..io.readers import load_table  # noqa: E402

# ---------------------------------------------------------------------------
# Quality-CLASSIFIER inference (the fasttext-style filter of real
# pretraining pipelines, distinct from the heuristic composite in
# text_quality_stats): a trained logistic-regression model applied as
# PURE CATALYST EXPRESSIONS — the weights are literals in the plan,
# so inference is a map-side projection with whole-stage codegen, no
# UDF, no shuffle until nothing (per-doc output). All arithmetic is
# integer fixed-point (ppm features x micro-logit weights), so the
# DuckDB oracle replays it bit-for-bit with no float-order hazard;
# the sigmoid is a clamped piecewise-linear approximation computed on
# a shifted NON-NEGATIVE operand (Spark `div` truncates toward zero
# while DuckDB `//` floors — they only agree on non-negatives, so the
# clamp happens BEFORE the divide).
#
# Scale: per-doc map work, trivially 100 TB-safe; the model rides in
# the plan (no broadcast, no lookup join).
# ---------------------------------------------------------------------------

_QC_BIAS = -2_500_000  # micro-logits
_QC_W_TTR = 3          # per ppm of type-token ratio
_QC_W_STOP = 2         # per ppm of stopword ratio
_QC_W_PUNCT = -4       # per ppm of punct-per-char
_QC_W_LEN = 8_000      # per token, capped at 200


def _qc_stop_list() -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS["en"])


def _qc_scores_ctes(carry: str = "") -> str:
    """The classifier oracle's CTE chain ending in a ``scores``
    relation (doc_id{carry}, logit_micro, prob_ppm, keep) so dependent
    oracles (per-domain calibration) replay the IDENTICAL arithmetic;
    ``carry`` is an extra projected column list like ``, source``."""
    return f"""tokd AS (
    SELECT doc_id{carry}, {sql_norm_text('text')} AS t FROM documents
),
feats AS (
    SELECT doc_id{carry},
           len(string_split(t, ' ')) AS n_tokens,
           len(list_distinct(string_split(t, ' '))) AS n_distinct,
           len(list_filter(string_split(t, ' '),
                           x -> x IN ({_qc_stop_list()}))) AS stop_hits,
           length(regexp_replace(t, '[a-z0-9\\s]', '', 'g')) AS punct,
           length(t) AS n_chars
    FROM tokd
),
ppm AS (
    SELECT doc_id{carry}, n_tokens,
           1000000 * n_distinct // n_tokens AS ttr_ppm,
           1000000 * stop_hits // n_tokens AS stop_ppm,
           1000000 * punct // n_chars AS punct_ppm
    FROM feats WHERE n_tokens > 0 AND n_chars > 0
),
logits AS (
    SELECT doc_id{carry},
           CAST({_QC_BIAS}
                + {_QC_W_TTR} * ttr_ppm
                + {_QC_W_STOP} * stop_ppm
                + {_QC_W_PUNCT} * punct_ppm
                + {_QC_W_LEN} * least(n_tokens, 200) AS BIGINT) AS logit_micro
    FROM ppm
),
scores AS (
    SELECT doc_id{carry},
           logit_micro,
           CAST(greatest(0, least(8000000, logit_micro + 4000000)) // 8
                AS BIGINT) AS prob_ppm,
           CAST(CASE WHEN logit_micro >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM logits
)"""


_QUALITY_CLASSIFIER_ORACLE = f"""
WITH {_qc_scores_ctes()}
SELECT doc_id, logit_micro, prob_ppm, keep FROM scores
"""


def classifier_scores(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """The classifier as a reusable STATELESS projection over any
    (doc_id, text) frame — batch or stream (it contains no aggregate,
    no window, no state), which is what lets the streaming twin reuse
    the identical Catalyst expressions AND the identical oracle.

    ``carry`` names extra input columns to pass through unchanged
    (e.g. the domain for per-domain calibration) — carrying them in
    the projection is free and avoids a corpus self-join later.
    """
    carry = tuple(carry)
    t = norm_text(F.col("text"))
    staged = docs.select(
        "doc_id",
        *carry,
        F.split(t, " ").alias("toks"),
        F.length(F.regexp_replace(t, r"[a-z0-9\s]", "")).cast("bigint").alias("punct"),
        F.length(t).cast("bigint").alias("n_chars"),
    )
    n_tokens = F.size("toks").cast("bigint")
    feats = staged.select(
        "doc_id",
        *carry,
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct"),
        F.size(F.filter("toks", lambda x: x.isin(*STOPWORDS["en"])))
        .cast("bigint")
        .alias("stop_hits"),
        "punct",
        "n_chars",
    ).where((F.col("n_tokens") > 0) & (F.col("n_chars") > 0))
    # Integer ppm features, then the literal-weight dot product. `div`
    # (Spark) == `//` (DuckDB) here because every numerator is
    # non-negative; the sigmoid operand is clamped non-negative BEFORE
    # its divide for the same reason.
    ppm = feats.select(
        "doc_id",
        *carry,
        "n_tokens",
        F.expr("1000000 * n_distinct div n_tokens").alias("ttr_ppm"),
        F.expr("1000000 * stop_hits div n_tokens").alias("stop_ppm"),
        F.expr("1000000 * punct div n_chars").alias("punct_ppm"),
    )
    logit = (
        F.lit(_QC_BIAS).cast("bigint")
        + F.lit(_QC_W_TTR) * F.col("ttr_ppm")
        + F.lit(_QC_W_STOP) * F.col("stop_ppm")
        + F.lit(_QC_W_PUNCT) * F.col("punct_ppm")
        + F.lit(_QC_W_LEN) * F.least(F.col("n_tokens"), F.lit(200).cast("bigint"))
    ).cast("bigint")
    return (
        ppm.select("doc_id", *carry, logit.alias("logit_micro"))
        .withColumn(
            "_shifted",
            F.greatest(
                F.lit(0).cast("bigint"),
                F.least(
                    F.lit(8_000_000).cast("bigint"),
                    F.col("logit_micro") + F.lit(4_000_000),
                ),
            ),
        )
        .select(
            "doc_id",
            *carry,
            "logit_micro",
            F.expr("_shifted div 8").cast("bigint").alias("prob_ppm"),
            F.when(F.col("logit_micro") >= 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("keep"),
        )
    )


@register(
    "quality_classifier_inference",
    _QUALITY_CLASSIFIER_ORACLE,
    doc="logistic-regression quality classifier applied as pure Catalyst "
    "expressions: literal trained weights x integer-ppm text features -> "
    "micro-logit, clamped piecewise-linear sigmoid (non-negative operand "
    "before the divide so Spark div == DuckDB //), keep decision; the "
    "fasttext-filter role of LLM pipelines as a map-side codegen "
    "projection, no UDF (late r8)",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return classifier_scores(docs)


# ---------------------------------------------------------------------------
# Domain MIXTURE allocation with temperature flattening (the data-
# mixing step of multilingual/multi-source pretraining: sample domains
# proportional to count^alpha so small domains are up-weighted;
# alpha = 0.5 here, i.e. weight = floor(sqrt(count)), which both
# engines compute identically because IEEE sqrt is correctly rounded
# and every count is far below 2^50). The integer budget is then
# apportioned by the LARGEST-REMAINDER method: base = B*w // W,
# leftover seats go to the largest remainders (ties broken by source
# asc) — all integer arithmetic, so the allocation is exact and the
# oracle replays it bit-for-bit.
#
# Scale: the only full-corpus work is the per-source count (one
# partial-agg shuffle of #domains rows); everything after operates on
# DOMAIN cardinality (thousands at most), so the unpartitioned
# rank-over-remainders window is bounded by output size, not corpus
# size — same justification as the k-bounded kmeans collect.
# ---------------------------------------------------------------------------

_MIX_BUDGET = 10_000

_DOMAIN_MIXTURE_ORACLE = f"""
WITH counts AS (
    SELECT source, CAST(count(*) AS BIGINT) AS cnt
    FROM documents GROUP BY source
),
weights AS (
    SELECT source, cnt,
           CAST(floor(sqrt(CAST(cnt AS DOUBLE))) AS BIGINT) AS w
    FROM counts
),
tot AS (
    SELECT source, cnt, w, sum(w) OVER () AS tot_w FROM weights
),
seats AS (
    SELECT source, cnt, w,
           {_MIX_BUDGET} * w // tot_w AS base_alloc,
           {_MIX_BUDGET} * w % tot_w AS rem,
           {_MIX_BUDGET} - sum({_MIX_BUDGET} * w // tot_w) OVER () AS leftover
    FROM tot
),
ranked AS (
    SELECT source, cnt, w, base_alloc, leftover,
           row_number() OVER (ORDER BY rem DESC, source ASC) AS rnk
    FROM seats
)
SELECT source, cnt, w AS weight,
       CAST(base_alloc AS BIGINT) AS base_alloc,
       CAST(base_alloc + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM ranked
"""


@register(
    "corpus_domain_mixture",
    _DOMAIN_MIXTURE_ORACLE,
    doc="temperature-flattened domain mixture allocation (weight = "
    "floor(sqrt(count)), i.e. alpha=0.5 sampling) apportioned over an "
    "integer budget by the largest-remainder method — the data-mixing "
    "step of a multi-source pretraining pipeline; corpus-scale work is "
    "one count shuffle, everything else is domain-cardinality (late r8)",
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("source")
    counts = docs.groupBy("source").agg(F.count("*").cast("bigint").alias("cnt"))
    weights = counts.withColumn(
        "w", F.floor(F.sqrt(F.col("cnt").cast("double"))).cast("bigint")
    )
    # Domain-cardinality windows from here down (bounded by #sources).
    everything = Window.partitionBy()
    seats = weights.withColumn("tot_w", F.sum("w").over(everything)).select(
        "source",
        "cnt",
        "w",
        F.expr(f"{_MIX_BUDGET} * w div tot_w").alias("base_alloc"),
        (F.lit(_MIX_BUDGET) * F.col("w") % F.col("tot_w")).alias("rem"),
    )
    seats = seats.withColumn(
        "leftover", F.lit(_MIX_BUDGET) - F.sum("base_alloc").over(everything)
    )
    ranked = seats.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy().orderBy(F.desc("rem"), F.asc("source"))
        ),
    )
    return ranked.select(
        "source",
        "cnt",
        F.col("w").alias("weight"),
        F.col("base_alloc").cast("bigint").alias("base_alloc"),
        (
            F.col("base_alloc")
            + F.when(F.col("rnk") <= F.col("leftover"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("alloc"),
    )


# ---------------------------------------------------------------------------
# UNPIVOT (melt): the registry has pivot (wide from long) but not its
# inverse — Spark's DataFrame.unpivot / ANSI UNPIVOT, which plans as
# a map-side Expand (the same machinery as grouping sets): each input
# row fans out to one row per measure with NO shuffle; the only
# shuffle is the final small aggregate (4 measures x #flags groups,
# partial-agg shrunk map-side). Measure sums are exact integer cents
# (floor(val*100) — floor BEFORE the cast because DuckDB CAST rounds
# while Spark truncates), so float-sum order dependence never enters.
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH long AS (
    UNPIVOT (
        SELECT l_returnflag, l_quantity, l_extendedprice, l_discount, l_tax
        FROM lineitem
    ) ON l_quantity, l_extendedprice, l_discount, l_tax
    INTO NAME measure VALUE val
)
SELECT l_returnflag, measure,
       CAST(sum(CAST(floor(val * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM long
GROUP BY l_returnflag, measure
"""


@register(
    "unpivot_measures_long",
    _UNPIVOT_ORACLE,
    doc="UNPIVOT/melt of four lineitem measures to long form (map-side "
    "Expand, zero shuffle until the final tiny aggregate) with exact "
    "integer-cents sums per (returnflag, measure) — the inverse of "
    "pivot_event_counts completes the reshape pair (late r8)",
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    )
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.sum(F.floor(F.col("val") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
        F.count("*").cast("bigint").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Per-domain quality-THRESHOLD calibration (the step after classifier
# inference in a real pretraining pipeline: a single global cutoff
# over-prunes domains whose score distribution sits low — news prose
# scores differently from forum text — so the keep threshold is
# calibrated PER DOMAIN as an exact order statistic: the k-th smallest
# micro-logit with k = 3n/10 + 1, i.e. "drop the bottom ~30% of each
# domain"). Everything is integer: the scores are the classifier's
# fixed-point micro-logits and the threshold is an element of the
# score multiset, so the oracle replays it bit-for-bit.
#
# Scale: exact per-group order statistics need a per-domain sort —
# one window shuffle partitioned by domain (parallel across domains;
# a skewed mega-domain would switch to approx/sampled calibration,
# documented trade-off). The threshold relation is domain-cardinality,
# broadcast back; the final aggregate is #domains rows.
# ---------------------------------------------------------------------------

_QUALITY_CALIBRATION_ORACLE = f"""
WITH {_qc_scores_ctes(", source")},
ranked AS (
    SELECT source, doc_id, logit_micro, keep,
           row_number() OVER (PARTITION BY source
                              ORDER BY logit_micro, doc_id) AS rnk,
           count(*) OVER (PARTITION BY source) AS n
    FROM scores
),
thresholds AS (
    SELECT source, logit_micro AS threshold_micro
    FROM ranked WHERE rnk = 3 * n // 10 + 1
)
SELECT r.source AS domain,
       CAST(max(r.n) AS BIGINT) AS n_docs,
       CAST(max(t.threshold_micro) AS BIGINT) AS threshold_micro,
       CAST(sum(CASE WHEN r.logit_micro >= t.threshold_micro
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_cal,
       CAST(sum(r.keep) AS BIGINT) AS n_kept_model
FROM ranked r JOIN thresholds t ON r.source = t.source
GROUP BY r.source
"""


@register(
    "quality_threshold_calibration",
    _QUALITY_CALIBRATION_ORACLE,
    doc="per-domain calibration of the quality classifier's keep "
    "threshold: exact k-th-smallest micro-logit per domain (k = 3n/10 "
    "+ 1, deterministic doc_id tie-break), domain-cardinality threshold "
    "relation broadcast back, per-domain kept counts vs the global "
    "model cutoff; one per-domain window sort + one tiny aggregate "
    "(late r8)",
)
def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    scores = classifier_scores(docs, carry=("source",)).select(
        "doc_id", "source", "logit_micro", "keep"
    )
    ranked = scores.select(
        "source",
        "doc_id",
        "logit_micro",
        "keep",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.asc("logit_micro"), F.asc("doc_id")
            )
        )
        .alias("rnk"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    thresholds = ranked.where(F.col("rnk") == F.expr("3 * n div 10 + 1")).select(
        "source", F.col("logit_micro").alias("threshold_micro")
    )
    joined = ranked.join(F.broadcast(thresholds), "source")
    return joined.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.max("threshold_micro").cast("bigint").alias("threshold_micro"),
        F.sum(
            F.when(F.col("logit_micro") >= F.col("threshold_micro"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_kept_cal"),
        F.sum("keep").cast("bigint").alias("n_kept_model"),
    ).withColumnRenamed("source", "domain")


# ---------------------------------------------------------------------------
# NATIVE RECURSIVE CTEs (late r8): Spark 4.x executes WITH RECURSIVE
# as an iterative union-loop — each iteration a fully distributed
# join/projection — so bounded-depth hierarchy walks (BOM rollups,
# org-chart climbs, fixed-horizon graph walks) are now declarative,
# and the portable SQL text is BOTH the Spark query and the DuckDB
# oracle (TPC-batch convention: the engines execute the identical
# statement).
#
# Verified engine boundary: Spark 4.1 supports only UNION ALL
# recursion (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE raised for
# UNION-distinct), so cycle-safe unbounded reachability still belongs
# to the operator library's connected-components loops
# (operators/dedup.py, documented crossover ~diameter 15); these
# queries are the bounded-depth declarative complement, with every
# recursion capped by an explicit depth/ancestor guard.
#
# Scale: per-iteration work is one distributed equi-join (parent or
# successor key) over the frontier; depth is log(tree) / a constant,
# so the iteration count — Spark's recursion limit and the 100 TB
# cost model both key off it — is bounded by design. All arithmetic
# is integer cents, so parity is exact.
# ---------------------------------------------------------------------------

_RECURSIVE_BOM_SQL = """
WITH RECURSIVE chain(part_id, anc, depth, chain_cents) AS (
    SELECT p_partkey, p_partkey, 0,
           CAST(floor(p_retailprice * 100) AS BIGINT)
    FROM part WHERE p_size = 50
    UNION ALL
    SELECT c.part_id, p.p_partkey, c.depth + 1,
           c.chain_cents + CAST(floor(p.p_retailprice * 100) AS BIGINT)
    FROM chain c JOIN part p
      ON p.p_partkey = CAST(floor((c.anc - 1) / 2) AS BIGINT)
    WHERE c.anc > 0
)
SELECT part_id,
       CAST(depth AS BIGINT) AS depth,
       chain_cents
FROM chain WHERE anc = 0
"""


@register(
    "recursive_bom_rollup",
    _RECURSIVE_BOM_SQL,
    doc="native WITH RECURSIVE (Spark 4.x iterative union-loop): "
    "BOM-style assembly-cost rollup climbing the implicit binary part "
    "hierarchy (parent = floor((k-1)/2)) from a filtered leaf set to "
    "the root, accumulating exact integer cents; one distributed "
    "parent-key join per level, depth bounded at log2(#parts); "
    "portable SQL text is query and oracle (late r8)",
)
def q_recursive_bom(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_BOM_SQL)


_RECURSIVE_WALK_SQL = """
WITH RECURSIVE walk(start_key, cur, step, bal_cents, n_supp) AS (
    SELECT s_suppkey, s_suppkey, 0,
           CAST(floor(s_acctbal * 100) AS BIGINT),
           (SELECT CAST(count(*) AS BIGINT) FROM supplier)
    FROM supplier WHERE s_suppkey % 7 = 0
    UNION ALL
    SELECT w.start_key, s.s_suppkey, w.step + 1,
           w.bal_cents + CAST(floor(s.s_acctbal * 100) AS BIGINT),
           w.n_supp
    FROM walk w JOIN supplier s
      ON s.s_suppkey = (w.cur * 7 + 3) % w.n_supp
    WHERE w.step < 12
)
SELECT start_key, cur AS end_key, bal_cents
FROM walk WHERE step = 12
"""


@register(
    "recursive_functional_walk",
    _RECURSIVE_WALK_SQL,
    doc="native WITH RECURSIVE fixed-horizon graph walk: from each "
    "seed supplier, follow the functional successor edge "
    "(cur*7+3 mod N, re-joining the supplier table every step) for "
    "exactly 12 hops, accumulating integer-cents balances along the "
    "path — the referral-chain / escalation-path shape; cycles are "
    "harmless because the horizon, not visited-set dedup, bounds the "
    "recursion (Spark 4.1 rejects UNION-distinct recursion — "
    "boundary pinned in tests); portable SQL text is query and "
    "oracle (late r8)",
)
def q_recursive_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_WALK_SQL)


# ---------------------------------------------------------------------------
# Spark 4.x SQL-surface births (late r8): correlated LATERAL join,
# ordered-set listagg, and SQL-defined UDFs — three API families the
# registry exercised only on the ORACLE side until now.
# ---------------------------------------------------------------------------

_LATERAL_TOPK_SQL = """
SELECT c.c_custkey, t.o_orderkey,
       CAST(floor(t.o_totalprice * 100) AS BIGINT) AS price_cents
FROM customer c JOIN LATERAL (
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t ON true
WHERE c.c_custkey % 100 = 0
"""


@register(
    "lateral_topk_per_customer",
    _LATERAL_TOPK_SQL,
    doc="correlated JOIN LATERAL with per-customer ORDER BY ... LIMIT 2 "
    "(the top-k-per-entity idiom written the SQL-standard way): "
    "Catalyst DECORRELATES it into WindowGroupLimit — map-side partial "
    "top-k pruning BEFORE the shuffle, then a broadcast join; no "
    "nested loop anywhere (plan-pinned). Portable SQL text is query "
    "and oracle; deterministic key tie-break (late r8)",
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPK_SQL)


# listagg (Spark 4.x) vs string_agg (DuckDB): same ordered-set
# semantics, different spellings — the one family where the texts
# must differ. The deterministic WITHIN GROUP order makes the
# concatenation exact; md5 keeps the row narrow.

_LISTAGG_ORACLE = """
SELECT n_name,
       md5(string_agg(s_name, '|' ORDER BY s_name)) AS names_md5,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(CAST(floor(s_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS bal_cents
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


@register(
    "listagg_supplier_directory",
    _LISTAGG_ORACLE,
    doc="ordered-set string aggregation: Spark 4.x listagg(...) WITHIN "
    "GROUP (ORDER BY ...) per nation, md5-projected; DuckDB replays "
    "with string_agg(... ORDER BY ...) — the explicit order makes the "
    "concatenation deterministic, the md5 hash makes any element or "
    "order slip a value mismatch (late r8)",
)
def q_listagg_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               md5(listagg(s_name, '|') WITHIN GROUP (ORDER BY s_name))
                   AS names_md5,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(CAST(floor(s_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS bal_cents
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


# SQL-defined UDF (Spark 4.x CREATE FUNCTION ... RETURN expr): the
# function body is pure SQL, so Catalyst INLINES it — unlike Python
# UDFs there is no serialization boundary, no Arrow hop, full
# codegen; this is the right tool for shared scalar business logic.
# The oracle inlines the identical expression by hand, proving the
# inlining is semantics-preserving.

_SQL_UDF_ORACLE = """
SELECT o_orderpriority,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "sql_udf_order_cents",
    _SQL_UDF_ORACLE,
    doc="SQL-defined scalar UDF (Spark 4.x CREATE TEMPORARY FUNCTION "
    "... RETURN expr) used inside a grouped aggregate: the body is "
    "inlined by Catalyst — no serialization boundary, stays in "
    "whole-stage codegen, unlike any Python UDF; the oracle hand-"
    "inlines the same expression so parity certifies the inlining "
    "(late r8)",
)
def q_sql_udf_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION order_cents(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(floor(x * 100) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(sum(order_cents(o_totalprice)) AS BIGINT) AS total_cents,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# TPC-DS batch 4 (late r8): the two reporting shapes the suite still
# lacked — rank-WITHIN-rollup-level (Q36) and dual-rank OR-filtered
# channel reports (Q49). TPC-batch convention: portable SQL text is
# query and oracle. NULLS FIRST is explicit everywhere a rollup NULL
# can reach an ORDER BY (Spark defaults NULLS FIRST, DuckDB NULLS
# LAST — implicit ordering would silently diverge).
# ---------------------------------------------------------------------------

_TPCDS_Q36_SQL = """
WITH agg AS (
    SELECT p_type, p_brand,
           grouping(p_type) + grouping(p_brand) AS lochierarchy,
           grouping(p_brand) AS g_brand,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS rev_cents,
           CAST(sum(CAST(floor(l_quantity * p_retailprice * 100)
                    AS BIGINT)) AS BIGINT) AS cost_cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY ROLLUP (p_type, p_brand)
)
SELECT coalesce(p_type, '(all)') AS p_type,
       coalesce(p_brand, '(all)') AS p_brand,
       CAST(lochierarchy AS BIGINT) AS lochierarchy,
       rev_cents, cost_cents,
       CAST(rank() OVER (
            PARTITION BY lochierarchy,
                         CASE WHEN g_brand = 1 THEN p_type END
            ORDER BY rev_cents - cost_cents ASC,
                     p_type ASC NULLS FIRST,
                     p_brand ASC NULLS FIRST) AS BIGINT) AS rank_within_parent
FROM agg
"""


@register(
    "tpcds_q36_rollup_rank",
    _TPCDS_Q36_SQL,
    doc="TPC-DS Q36 shape: gross-margin ROLLUP over the (type, brand) "
    "hierarchy with rank-WITHIN-PARENT — the window partitions on the "
    "GROUPING level plus the parent key (CASE on grouping(brand)), so "
    "each hierarchy level ranks its own children; exact integer-cents "
    "margin ordering with key tie-breaks, explicit NULLS FIRST; "
    "portable SQL text is query and oracle (late r8)",
)
def q_tpcds_q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_TPCDS_Q36_SQL)


_TPCDS_Q49_SQL = """
WITH base AS (
    SELECT l_returnflag AS channel, p_brand,
           CAST(sum(CASE WHEN l_discount > 0
                    THEN CAST(floor(l_quantity) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS disc_qty,
           CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS tot_qty,
           CAST(sum(CASE WHEN l_discount > 0
                    THEN CAST(floor(l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS disc_amt_cents,
           CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS tot_amt_cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY l_returnflag, p_brand
),
ranked AS (
    SELECT *,
           rank() OVER (PARTITION BY channel
                        ORDER BY CAST(disc_qty AS DOUBLE) / tot_qty,
                                 p_brand) AS qty_rank,
           rank() OVER (PARTITION BY channel
                        ORDER BY CAST(disc_amt_cents AS DOUBLE) / tot_amt_cents,
                                 p_brand) AS amt_rank
    FROM base
)
SELECT channel, p_brand, disc_qty, tot_qty, disc_amt_cents, tot_amt_cents,
       CAST(qty_rank AS BIGINT) AS qty_rank,
       CAST(amt_rank AS BIGINT) AS amt_rank
FROM ranked
WHERE qty_rank <= 10 OR amt_rank <= 10
"""


@register(
    "tpcds_q49_dual_rank_report",
    _TPCDS_Q49_SQL,
    doc="TPC-DS Q49 shape: per-channel dual ratio ranking (discounted "
    "quantity share and discounted currency share, two rank() windows "
    "over the same partition) with the OR-filter keeping items in "
    "either top-10, reported across all channels; ratio ORDER BY is "
    "IEEE division of exact integers (correctly rounded in both "
    "engines) with key tie-breaks; portable SQL text is query and "
    "oracle (late r8)",
)
def q_tpcds_q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_TPCDS_Q49_SQL)


# ---------------------------------------------------------------------------
# Quantile-SKETCH certificate (late r8): the approx-percentile twin of
# token_heavy_hitters_sketch's Misra-Gries certificate. Spark's
# percentile_approx (Greenwald-Khanna summaries, mergeable — the one-
# pass 100 TB quantile path) returns values whose exact rank may vary
# with partitioning, so the raw estimates can never be hash-checked.
# The registered output is the sketch's CERTIFICATE instead: for each
# target quantile, the EXACT order statistic (computed with the
# distributed global-rank pattern — range-sort + per-partition offset,
# no single-task window) plus integer flags the sketch must satisfy
# under ANY partitioning — the returned value is an element of the
# multiset, and its exact-rank interval intersects the GK guarantee
# band (target +- n/accuracy). The oracle recomputes the exact
# statistics and expects literal 1s: a broken sketch flips a flag and
# fails the hash. The 5x map-side fan-out for the rank counts shrinks
# immediately in partial aggregation (5 groups).
# ---------------------------------------------------------------------------

_QSK_PERMILLE = (100, 250, 500, 750, 900)
_QSK_ACCURACY = 1000

_QUANTILE_CERT_ORACLE = f"""
WITH cents AS (
    SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS c,
           o_orderkey AS k
    FROM orders
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cents),
ranked AS (
    SELECT c, row_number() OVER (ORDER BY c, k) AS r FROM cents
),
qs AS (
    SELECT CAST(unnest([{", ".join(str(q) for q in _QSK_PERMILLE)}])
                AS BIGINT) AS q_permille
)
SELECT q.q_permille,
       CAST(q.q_permille * (n.n - 1) // 1000 + 1 AS BIGINT) AS target_rank,
       (SELECT c FROM ranked
        WHERE r = q.q_permille * (n.n - 1) // 1000 + 1) AS exact_cents,
       CAST(1 AS INT) AS sk_value_is_element,
       CAST(1 AS INT) AS sk_within_bound
FROM qs q, n
"""


@register(
    "quantile_sketch_certificate",
    _QUANTILE_CERT_ORACLE,
    doc="percentile_approx (mergeable GK summaries, the one-pass 100 TB "
    "quantile path) hash-certified in-query: output = exact order "
    "statistics at 5 target quantiles (distributed global-rank, no "
    "single-task window) + partitioning-independent invariant flags "
    "(returned value is a data element; its exact-rank interval meets "
    "the n/accuracy guarantee band); oracle expects all-ones "
    "(late r8; mirrors token_heavy_hitters_sketch)",
)
def q_quantile_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.window_metrics import with_global_rank

    cents = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        F.col("o_orderkey").alias("k"),
    )
    n_row = cents.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    # The sketch under certification: one pass, mergeable summaries.
    probs = [q / 1000.0 for q in _QSK_PERMILLE]
    approx_row = cents.agg(
        F.percentile_approx(
            "c", F.array(*[F.lit(p) for p in probs]), F.lit(_QSK_ACCURACY)
        ).alias("vs")
    )
    qv = (
        approx_row.crossJoin(F.broadcast(n_row))
        .select(
            "n",
            F.posexplode(
                F.arrays_zip(
                    F.array(
                        *[F.lit(q).cast("bigint") for q in _QSK_PERMILLE]
                    ).alias("q_permille"),
                    F.col("vs").alias("v"),
                )
            ),
        )
        .select(
            F.col("col.q_permille").alias("q_permille"),
            F.col("col.v").alias("v"),
            F.expr("col.q_permille * (n - 1) div 1000 + 1")
            .cast("bigint")
            .alias("t"),
            F.expr(f"n div {_QSK_ACCURACY} + 1").cast("bigint").alias("bound"),
        )
    )
    # Exact-rank counts of each sketch value: 5x map-side fan-out,
    # collapsed by partial agg before the 5-group shuffle.
    counts = (
        cents.crossJoin(F.broadcast(qv.select("q_permille", "v")))
        .groupBy("q_permille")
        .agg(
            F.sum((F.col("c") < F.col("v")).cast("bigint")).alias("r_lt"),
            F.sum((F.col("c") <= F.col("v")).cast("bigint")).alias("r_le"),
            F.max((F.col("c") == F.col("v")).cast("int")).alias("is_elem"),
        )
    )
    # Exact order statistics at the target ranks — distributed rank,
    # then a 5-row broadcast semi-lookup.
    ranked = with_global_rank(cents, ["c", "k"], rank_col="r")
    exacts = ranked.join(
        F.broadcast(qv.select("q_permille", "t")), F.col("r") == F.col("t")
    ).select("q_permille", F.col("c").alias("exact_cents"))
    return (
        qv.join(counts, "q_permille")
        .join(exacts, "q_permille")
        .select(
            "q_permille",
            F.col("t").alias("target_rank"),
            "exact_cents",
            F.col("is_elem").cast("int").alias("sk_value_is_element"),
            (
                (F.col("r_le") >= F.col("t") - F.col("bound"))
                & (F.col("r_lt") + 1 <= F.col("t") + F.col("bound"))
            )
            .cast("int")
            .alias("sk_within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# Arrow-NATIVE batch UDF surface (late r8): mapInArrow is the lowest-
# overhead Python boundary Spark has — RecordBatches flow straight
# into pyarrow.compute kernels with NO pandas materialization (the
# pandas_udf/mapInPandas paths each pay an Arrow<->pandas conversion
# per batch). The registry exercises every other §2.12 surface
# (pandas_udf, mapInPandas, grouped map, UDTF); this completes it.
# The kernels here are exact integer facts (utf8 byte length, space
# count) so DuckDB replays them with strlen/replace arithmetic.
# ---------------------------------------------------------------------------

_ARROW_NATIVE_ORACLE = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(sum(length(text) - length(replace(text, ' ', ''))) AS BIGINT)
           AS total_spaces
FROM documents
GROUP BY lang
"""


@register(
    "arrow_native_batch_stats",
    _ARROW_NATIVE_ORACLE,
    doc="mapInArrow (Arrow-native batch UDF — pyarrow.compute kernels "
    "on RecordBatches, zero pandas conversion) computing per-doc utf8 "
    "byte length and space count, aggregated per lang; completes the "
    "SURVEY §2.12 Python-boundary matrix alongside pandas_udf / "
    "mapInPandas / grouped-map / UDTF (late r8)",
)
def q_arrow_native_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def kernel(batches):
        import pyarrow.compute as pc

        for batch in batches:
            t = pa.Table.from_batches([batch])
            yield pa.RecordBatch.from_arrays(
                [
                    t["lang"].combine_chunks(),
                    pc.binary_length(
                        t["text"].combine_chunks().cast(pa.binary())
                    ).cast(pa.int64()),
                    pc.count_substring(t["text"].combine_chunks(), " ").cast(
                        pa.int64()
                    ),
                ],
                names=["lang", "n_bytes", "n_spaces"],
            )

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    mapped = docs.mapInArrow(
        kernel, "lang string, n_bytes bigint, n_spaces bigint"
    )
    return mapped.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum("n_spaces").cast("bigint").alias("total_spaces"),
    )


# applyInArrow — the GROUPED Arrow-native cell: each language's docs
# arrive as one pyarrow.Table (no pandas), and the kernel computes a
# whole-group order statistic (discrete low median of byte lengths —
# something a plain aggregate can't do without a sort) in Arrow
# compute. Oracle replays with a per-group row_number.

_ARROW_GROUPED_ORACLE = """
WITH b AS (
    SELECT lang, strlen(text) AS nb FROM documents
),
r AS (
    SELECT lang, nb,
           row_number() OVER (PARTITION BY lang ORDER BY nb) AS rn,
           count(*) OVER (PARTITION BY lang) AS n
    FROM b
)
SELECT lang,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN nb END) AS BIGINT)
           AS median_bytes,
       CAST(max(nb) AS BIGINT) AS max_bytes
FROM r GROUP BY lang
"""


@register(
    "arrow_grouped_apply_stats",
    _ARROW_GROUPED_ORACLE,
    doc="applyInArrow (grouped Arrow-native UDF — each group one "
    "pyarrow.Table, zero pandas) computing the discrete low-median "
    "byte length per language, a whole-group order statistic that "
    "justifies the grouped shape; oracle replays via per-group "
    "row_number (late r8; §2.12 matrix)",
)
def q_arrow_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def fn(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        lang = t["lang"][0].as_py()
        nb = pc.binary_length(
            t["text"].combine_chunks().cast(pa.binary())
        ).cast(pa.int64())
        sorted_nb = pc.array_sort_indices(nb)
        n = len(nb)
        median = nb[sorted_nb[(n + 1) // 2 - 1].as_py()].as_py()
        return pa.table(
            {
                "lang": [lang],
                "n_docs": pa.array([n], pa.int64()),
                "median_bytes": pa.array([median], pa.int64()),
                "max_bytes": pa.array([pc.max(nb).as_py()], pa.int64()),
            }
        )

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    return docs.groupBy("lang").applyInArrow(
        fn, "lang string, n_docs bigint, median_bytes bigint, max_bytes bigint"
    )


# arrow_udf — the SCALAR Arrow-native cell (Spark 4.x): a vectorized
# column UDF whose batches are pyarrow Arrays end to end, usable
# inside ordinary projections unlike mapInArrow. Same exact-integer
# contract: count of a literal substring, replayed by the oracle with
# replace() arithmetic.

_ARROW_SCALAR_ORACLE = """
SELECT lang,
       CAST(sum(length(text) - length(replace(text, 'e', ''))) AS BIGINT)
           AS total_e,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY lang
"""


import pyarrow as pa  # noqa: E402  (module-level so PEP-563 string
# annotations on arrow_udf kernels resolve via function __globals__)


@register(
    "arrow_scalar_udf_stats",
    _ARROW_SCALAR_ORACLE,
    doc="scalar arrow_udf (Spark 4.x vectorized Arrow column UDF — "
    "pyarrow Array in, Array out, inside a normal projection) counting "
    "a literal substring per doc, aggregated per lang; the third "
    "Arrow-native cell beside mapInArrow / applyInArrow (late r8; "
    "§2.12 matrix)",
)
def q_arrow_scalar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import arrow_udf

    @arrow_udf("bigint")
    def count_e(text: pa.Array) -> pa.Array:
        import pyarrow.compute as pc

        return pc.count_substring(text, "e").cast(pa.int64())

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    return (
        docs.select("lang", count_e("text").alias("n_e"))
        .groupBy("lang")
        .agg(
            F.sum("n_e").cast("bigint").alias("total_e"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket ASSOCIATION RULES (late r8): frequent co-occurring
# item pairs with support counts — the rule-mining family (distinct
# from the graph-shaped triangle/basket counting): candidate pairs
# come from a self-equi-join on the basket key with an item-order
# predicate (each unordered pair once), so pair volume is
# sum_b k_b(k_b-1)/2 — bounded by basket sizes, never |items|^2.
# Confidence is reported as its exact integer (numerator,
# denominator) pair, not a float division. At 100 TB the same plan
# holds: pair expansion is map-side within the basket-key join, the
# support HAVING prunes before the final dimension joins, and a
# skewed mega-basket would be capped/salted (documented trade-off;
# TPC baskets are naturally bounded).
# ---------------------------------------------------------------------------

_ASSOC_RULES_SQL = """
WITH baskets AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
item_support AS (
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS sup
    FROM baskets GROUP BY l_partkey
),
pair_support AS (
    SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
           CAST(count(*) AS BIGINT) AS sup_ab
    FROM baskets a JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING count(*) >= 3
)
SELECT p.item_a, p.item_b, p.sup_ab,
       sa.sup AS sup_a, sb.sup AS sup_b
FROM pair_support p
JOIN item_support sa ON sa.l_partkey = p.item_a
JOIN item_support sb ON sb.l_partkey = p.item_b
"""


@register(
    "basket_association_rules",
    _ASSOC_RULES_SQL,
    doc="market-basket association rules: frequent item PAIRS by "
    "basket self-join (item_a < item_b gives each unordered pair "
    "once; pair volume bounded by per-basket sizes, not item-count "
    "squared), min-support HAVING before the item-support joins, "
    "confidence reported as exact integer numerator/denominator; "
    "portable SQL text is query and oracle (late r8)",
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_ASSOC_RULES_SQL)


# ---------------------------------------------------------------------------
# TPC-DS batch 5 — the two window-over-join shapes still absent.
#
# Q51 shape: per-entity cumulative daily revenue in TWO channels,
# FULL OUTER joined on (entity, day), each side's cumulative carried
# across the other side's missing days by a running MAX over the
# joined timeline, then the crossover rows where the web cumulative
# overtakes store. Q57 shape below. Portable SQL text is query and
# oracle, like every TPC batch.
#
# Scale notes: the per-channel cumulative, the full-outer join, and
# the post-join running max all key on user_id — ONE hash
# partitioning reused across the three stages under AQE; the daily
# pre-aggregation shrinks the join inputs map-side first. All money
# is BIGINT cents (floor(value*100)); a float cumulative would make
# the crossover set order-dependent.
# ---------------------------------------------------------------------------

_TPCDS_Q51_SQL = """
WITH click_daily AS (
    SELECT user_id, CAST(ts AS DATE) AS d,
           sum(CAST(floor(value * 100) AS BIGINT)) AS cents
    FROM events WHERE event_type = 'click'
    GROUP BY user_id, CAST(ts AS DATE)
),
purchase_daily AS (
    SELECT user_id, CAST(ts AS DATE) AS d,
           sum(CAST(floor(value * 100) AS BIGINT)) AS cents
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, CAST(ts AS DATE)
),
click_cum AS (
    SELECT user_id, d,
           sum(cents) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM click_daily
),
purchase_cum AS (
    SELECT user_id, d,
           sum(cents) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM purchase_daily
),
joined AS (
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(c.d, p.d) AS d,
           c.cum AS click_cum_raw,
           p.cum AS purchase_cum_raw
    FROM click_cum c
    FULL OUTER JOIN purchase_cum p
      ON c.user_id = p.user_id AND c.d = p.d
),
carried AS (
    SELECT user_id, d,
           max(click_cum_raw) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS click_cum,
           max(purchase_cum_raw) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS purchase_cum
    FROM joined
)
SELECT user_id, CAST(d AS DATE) AS d,
       CAST(click_cum AS BIGINT) AS click_cum,
       CAST(purchase_cum AS BIGINT) AS purchase_cum
FROM carried
WHERE click_cum IS NOT NULL AND purchase_cum IS NOT NULL
  AND click_cum > purchase_cum
"""


@register(
    "tpcds_q51_cumulative_crossover",
    _TPCDS_Q51_SQL,
    doc="TPC-DS Q51 shape: per-user cumulative daily cents in two "
    "channels, FULL OUTER join on (user, day), running-MAX carry "
    "across each side's missing days, crossover filter — one "
    "user-keyed partitioning reused by cumulative windows, join and "
    "carry under AQE; portable SQL is query and oracle (late r8)",
)
def q_tpcds_q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_TPCDS_Q51_SQL)


# ---------------------------------------------------------------------------
# Q57 shape: monthly channel revenue vs the channel-year average, the
# deviation filter kept EXACT (10*|n*sum_m - year_total| > year_total
# instead of abs(sum/avg - 1) > 0.1 — no float average in a
# predicate), neighbor months attached by the rank self-join exactly
# as Q57's v2 does (not lag/lead — the join-by-rank formulation is
# the shape this batch adds).
# ---------------------------------------------------------------------------

_TPCDS_Q57_SQL = """
WITH monthly AS (
    SELECT event_type,
           CAST(EXTRACT(YEAR FROM ts) AS BIGINT) AS yr,
           CAST(EXTRACT(MONTH FROM ts) AS BIGINT) AS mo,
           sum(CAST(floor(value * 100) AS BIGINT)) AS cents
    FROM events
    GROUP BY 1, 2, 3
),
v1 AS (
    SELECT event_type, yr, mo, cents,
           sum(cents) OVER (PARTITION BY event_type, yr) AS year_total,
           count(*) OVER (PARTITION BY event_type, yr) AS n_months,
           row_number() OVER (
               PARTITION BY event_type ORDER BY yr, mo
           ) AS rn
    FROM monthly
)
SELECT v.event_type, v.yr, v.mo,
       CAST(v.cents AS BIGINT) AS month_cents,
       CAST(v.year_total AS BIGINT) AS year_total,
       CAST(prev.cents AS BIGINT) AS prev_cents,
       CAST(nxt.cents AS BIGINT) AS next_cents
FROM v1 v
JOIN v1 prev ON prev.event_type = v.event_type AND prev.rn = v.rn - 1
JOIN v1 nxt  ON nxt.event_type = v.event_type AND nxt.rn = v.rn + 1
WHERE v.year_total > 0
  AND 10 * abs(v.n_months * v.cents - v.year_total) > v.year_total
"""


@register(
    "tpcds_q57_monthly_deviation",
    _TPCDS_Q57_SQL,
    doc="TPC-DS Q57 shape: monthly channel cents vs channel-year "
    "average with the deviation predicate cross-multiplied into "
    "exact BIGINT (10*|n*sum - total| > total), neighbor months via "
    "the rank self-join of Q57's v2; portable SQL is query and "
    "oracle (late r8)",
)
def q_tpcds_q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_TPCDS_Q57_SQL)


# ---------------------------------------------------------------------------
# TPC-DS batch 6 (late r8): Q80's channel netting census — per
# channel, sales LEFT JOIN returns (missing returns coalesce to 0:
# the outer-join netting), UNION ALL across the three channels, then
# ROLLUP(channel, brand) with grouping markers. The one TPC-DS
# composition the suite lacked: outer-join netting UNDER a rollup.
# Channels = a supplier-derived mode dimension (the synthetic
# lineitem carries no l_shipmode; l_suppkey % 3 is deterministic in
# both engines); returns = returnflag 'R' rows, exactly Q93's
# self-derived returns convention. Portable SQL text is query and
# oracle, like every TPC batch.
# ---------------------------------------------------------------------------

_TPCDS_Q80_SQL = """
WITH li AS (
    SELECT CASE l_suppkey % 3 WHEN 0 THEN 'AIR'
                              WHEN 1 THEN 'SHIP'
                              ELSE 'TRUCK' END AS channel,
           l_partkey,
           CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
           l_returnflag
    FROM lineitem
),
sales AS (
    SELECT channel, l_partkey, sum(cents) AS s
    FROM li GROUP BY channel, l_partkey
),
rets AS (
    SELECT channel, l_partkey, sum(cents) AS r
    FROM li WHERE l_returnflag = 'R'
    GROUP BY channel, l_partkey
),
net AS (
    SELECT s.channel, s.l_partkey, s.s, coalesce(r.r, 0) AS r
    FROM (SELECT * FROM sales WHERE channel = 'AIR') s
    LEFT JOIN rets r
      ON s.channel = r.channel AND s.l_partkey = r.l_partkey
    UNION ALL
    SELECT s.channel, s.l_partkey, s.s, coalesce(r.r, 0) AS r
    FROM (SELECT * FROM sales WHERE channel = 'SHIP') s
    LEFT JOIN rets r
      ON s.channel = r.channel AND s.l_partkey = r.l_partkey
    UNION ALL
    SELECT s.channel, s.l_partkey, s.s, coalesce(r.r, 0) AS r
    FROM (SELECT * FROM sales WHERE channel = 'TRUCK') s
    LEFT JOIN rets r
      ON s.channel = r.channel AND s.l_partkey = r.l_partkey
),
branded AS (
    SELECT n.channel, p.p_brand, n.s, n.r
    FROM net n JOIN part p ON n.l_partkey = p.p_partkey
)
SELECT channel, p_brand,
       CAST(grouping(channel) AS BIGINT) AS g_ch,
       CAST(grouping(p_brand) AS BIGINT) AS g_br,
       CAST(sum(s) AS BIGINT) AS sales_cents,
       CAST(sum(r) AS BIGINT) AS returns_cents,
       CAST(sum(s) - sum(r) AS BIGINT) AS net_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM branded
GROUP BY ROLLUP(channel, p_brand)
"""


@register(
    "tpcds_q80_channel_netting",
    _TPCDS_Q80_SQL,
    doc="TPC-DS Q80 shape: per-channel sales LEFT JOIN returns "
    "(coalesce-0 netting), UNION ALL of the three channels, "
    "ROLLUP(channel, brand) with grouping markers — outer-join "
    "netting under a rollup, exact BIGINT cents; portable SQL is "
    "query and oracle (late r8, TPC-DS batch 6)",
)
def q_tpcds_q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_TPCDS_Q80_SQL)
