"""Query registry — the single source of truth wired into
``__spark_entry__.py`` (driver contract) and the parity tests.

Each entry: name → (spark_fn, oracle_sql | None). ``spark_fn`` takes
(spark, sf_dir) and returns a DataFrame; ``oracle_sql`` is ANSI SQL
DuckDB runs over the same parquet files. Column names/aliases MUST
match between the two (driver hashes values after sorting columns by
name). Entries with ``oracle_sql=None`` get a weaker rows-only check
(reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..caching import release_caches
from ..session import harden


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            harden(spark)
            # Free any frames the PREVIOUS query persisted (its action
            # has completed by the time the caller asks for the next
            # plan), so a long-lived session holds at most one query's
            # caches. Callers that want immediate teardown call
            # caching.release_caches() themselves after the action.
            release_caches()
            return fn(spark, sf_dir)

        _REGISTRY[name] = Query(name, wrapped, oracle, doc)
        return wrapped

    return deco


# Explicit driver-facing ordering. The verify driver hash-checks the first
# 50 registry entries against their DuckDB oracles. The window ROTATES
# each round (round-2 verdict item 1): a ~15-query core regression set
# covering every family stays pinned; round 5 gives every other slot to
# the 26 queries that landed AFTER the round-4 rotation and therefore
# have never been driver-checked (round-4 verdict item 1: TPC-H batches
# 3+4, the finance analytics, funnel/cohort/OHLC, connected components,
# heavy hitters, int8 quantization, regex/bitwise suites, the
# training-build capstone), plus the two queries whose raw array<>
# outputs crashed the driver canonicalizer in r4 (now final-projected
# to scalars / JSON strings — round-4 verdict item 2), plus this
# round's new queries. Remaining slots: the stalest r2-only greens.
# Rotation never un-verifies anything locally: every registry oracle is
# re-checked on every pytest run by tests/test_oracle_parity.py
# (full-registry parametrize).
_PRIORITY: tuple[str, ...] = (
    # --- Core regression set (trimmed to 5 late in r5 so every query
    # --- born this round gets its first driver row — the lesson of
    # --- the r4 verdict applied to our own additions. Rotated out on
    # --- their r4 greens (families still represented in-window):
    # --- qa_aggregate, orc_roundtrip_agg, dedup_minhash_lsh,
    # --- text_quality_stats, symbol_validation, csv_roundtrip_agg,
    # --- topk_movers_per_day, dedup_embedding_cosine,
    # --- broadcast_star_join, grouped_agg_pricing. Every registry
    # --- oracle is still re-verified on every local pytest run. ---
    "flagship_window_metrics",  # reference flagship (windows W1-W3)
    "similarity_lsh_topk",  # ANN family
    "corpus_curation_pipeline",  # LLM-pipeline capstone
    "streaming_tumbling_counts",  # streaming family
    "multimodal_decode_dims",  # multimodal real-header decode
    # --- r4 driver ERRORS, now canonicalizer-safe: array_functions_suite
    # --- projects the sorted prefix as scalar doubles (hash-checked);
    # --- multimodal_decode_features serializes the histogram via
    # --- to_json and keeps its declared rows-only check ---
    "array_functions_suite",
    "multimodal_decode_features",
    # --- Never driver-checked (landed after the r4 window rotation) ---
    "sma_crossover_signals",
    "max_drawdown_per_symbol",
    "vwap_per_symbol_day",
    "abc_pareto_classification",
    "basket_part_cooccurrence",
    "regex_functions_suite",
    "bitwise_agg_suite",
    "feature_outlier_fences",
    "event_funnel_conversion",
    "cohort_retention_weekly",
    "ohlc_hourly_resample",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_quantity",
    "tpch_q18_large_orders",
    "tpch_q20_excess_share_supplier",
    "tpch_q21_waiting_supplier",
    "dedup_connected_components",
    "token_heavy_hitters_sketch",  # rows-only by design (sketch)
    "embedding_quantize_int8",
    "corpus_training_build",
    "streaming_ohlc_bars",
    # --- New round-5 queries (first driver rows) ---
    "tpch_q9_profit",
    "tpch_q12_shipmode",
    "streaming_ohlc_bars_append",
    "text_repetition_stats",
    "corpus_decontamination_bloom",
    "corpus_unigram_stats",
    "corpus_boilerplate_rewrite",
    "bucketed_fact_join",
    "streaming_stream_stream_left_join",
    "corpus_tfidf_topterms",
    "dedup_semantic_clusters",
    "xml_roundtrip_agg",
    "corpus_reservoir_sample",
    "corpus_train_val_test_split",
    "triangle_count_basket",
    "entity_resolution_customers",
    "schema_evolution_scan",
)


def all_queries() -> dict[str, Query]:
    # Import modules for their registration side effects.
    from . import queries_reference  # noqa: F401
    from . import queries_extensions  # noqa: F401
    from . import queries_analytics  # noqa: F401
    from . import queries_sources  # noqa: F401
    from . import queries_relational2  # noqa: F401
    from . import queries_northstar  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_multimodal  # noqa: F401
    from . import queries_quality  # noqa: F401

    ordered: dict[str, Query] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
