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
        # A duplicate registration would silently REPLACE the earlier
        # query (dict assignment) — the driver would then hash the new
        # body under the old name and the old query would vanish from
        # the surface without any test failing. Fail loudly instead
        # (a near-miss in late r8 motivated this guard).
        if name in _REGISTRY:
            raise ValueError(
                f"duplicate query registration: {name!r} is already "
                f"registered; pick a distinct name"
            )

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
# each round (round-2 verdict item 1). Round-10 policy (unchanged from
# r7/r8/r9): (a) queries BORN this round — and queries whose oracle was
# UPGRADED — are inserted at the head the moment they land, so
# after-rotation debt cannot recur; (b) every remaining slot is the
# stalest-green fill, GENERATED from the CORRECTNESS union by
# `scripts/coverage_report.py` (stalest_ok, oracle-bearing entries
# only) — argmin(latest OK round), ties by name. Rotation never
# un-verifies anything locally: every registry oracle is re-checked on
# every pytest run by tests/test_oracle_parity.py (full-registry
# parametrize), and output schemas are swept by
# tests/test_schema_audit.py.
_PRIORITY: tuple[str, ...] = (
    # --- r10 birth (inserted at birth per the standing policy,
    # displacing the last stalest fill xml_roundtrip_agg to keep
    # exactly 50):
    "streaming_cdc_upsert_bucketed",  # r10: touched-buckets CDC merge
    # --- r10 fills: zero debts pending (CORRECTNESS_r09 closed
    # everything — coverage_report shows never_checked=[],
    # oracle_upgraded_pending=[], ever_error=[]), so the rest is pure
    # stalest-green rotation. Generated 2026-08-15 from
    # `scripts/coverage_report.py` stalest_ok after CORRECTNESS_r09
    # (oracle-bearing only; r4-era rows first, then the r5 band —
    # next stalest after these: xml_roundtrip_agg (r5, displaced),
    # then abc_pareto_classification at r6):
    "streaming_sliding_sums",  # r4
    "streaming_static_enrich",  # r4
    "streaming_stream_stream_join",  # r4
    "streaming_tumbling_counts_rocksdb",  # r4
    "symbol_validation",  # r4
    "text_quality_stats",  # r4
    "topk_movers_per_day",  # r4
    "udtf_split_sentences",  # r4
    "unpivot_order_metrics",  # r4
    "weighted_avg_pricing_decimal",  # r4
    "array_functions_suite",  # r5
    "basket_part_cooccurrence",  # r5
    "bitwise_agg_suite",  # r5
    "bucketed_fact_join",  # r5
    "cohort_retention_weekly",  # r5
    "corpus_boilerplate_rewrite",  # r5
    "corpus_decontamination_bloom",  # r5
    "corpus_reservoir_sample",  # r5
    "corpus_tfidf_topterms",  # r5
    "corpus_train_val_test_split",  # r5
    "corpus_training_build",  # r5
    "corpus_unigram_stats",  # r5
    "dedup_connected_components",  # r5
    "dedup_semantic_clusters",  # r5
    "event_funnel_conversion",  # r5
    "feature_outlier_fences",  # r5
    "max_drawdown_per_symbol",  # r5
    "ohlc_hourly_resample",  # r5
    "regex_functions_suite",  # r5
    "schema_evolution_scan",  # r5
    "sma_crossover_signals",  # r5
    "streaming_ohlc_bars",  # r5
    "streaming_stream_stream_left_join",  # r5
    "streaming_tumbling_counts",  # r5
    "text_repetition_stats",  # r5
    "tpch_q12_shipmode",  # r5
    "tpch_q14_promo_share",  # r5
    "tpch_q15_top_supplier",  # r5
    "tpch_q16_supplier_counts",  # r5
    "tpch_q17_small_quantity",  # r5
    "tpch_q18_large_orders",  # r5
    "tpch_q20_excess_share_supplier",  # r5
    "tpch_q21_waiting_supplier",  # r5
    "tpch_q2_min_cost_supplier",  # r5
    "tpch_q7_nation_volume",  # r5
    "tpch_q8_market_share",  # r5
    "tpch_q9_profit",  # r5
    "triangle_count_basket",  # r5
    "vwap_per_symbol_day",  # r5
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
    from . import queries_r6  # noqa: F401
    from . import queries_r7  # noqa: F401
    from . import queries_r8  # noqa: F401
    from . import queries_r9  # noqa: F401
    from . import queries_indicators  # noqa: F401

    ordered: dict[str, Query] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
