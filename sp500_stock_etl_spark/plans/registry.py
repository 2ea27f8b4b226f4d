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
    # --- r15 window. Policy unchanged (r7..r14): births and
    # semantically-rewritten/oracle-upgraded queries at the head the
    # moment they land; every remaining slot is the stalest-green
    # fill GENERATED from the CORRECTNESS union by
    # `scripts/coverage_report.py` (stalest_ok, oracle-bearing only).
    # Head (r14 verdict item 6): the r14 semantic rewrites the r14
    # driver sample never exercised — the 5 CDC-upsert stores
    # (max_by resolve + one-pass staging), both jsonl-sink
    # round-trips (vectorized serializer), streaming_corpus_dedup
    # (inclusion-exclusion jaccard) — plus the two families this
    # round's optimizations touch (PQ trainer, arrow UDTF). Fills
    # generated 2026-08-18 after CORRECTNESS_r14 (zero debts:
    # never_checked = [], oracle_upgraded_pending = [],
    # ever_error = []).
    "streaming_cdc_upsert_multibatch",  # r14 rewrite (verdict item 6)
    "streaming_cdc_upsert_bucketed",  # r14 rewrite (verdict item 6)
    "streaming_cdc_upsert_filestats",  # r14 rewrite (verdict item 6)
    "streaming_cdc_upsert_tenant",  # r14 rewrite (verdict item 6)
    "streaming_cdc_upsert_sharded",  # r14 rewrite (verdict item 6)
    "jsonl_sink_roundtrip_agg",  # r14 rewrite (verdict item 6)
    "streaming_jsonl_sink_roundtrip",  # r14 rewrite (verdict item 6)
    "streaming_corpus_dedup",  # r14 rewrite (verdict item 6)
    "embedding_pq_encode_init",  # r15-touched family
    "arrow_udtf_installments",  # r15-touched family
    # r15 continuation: plans whose shingle/winnow map stage gained the
    # guarded ensure_parallelism repartition — driver-side parity
    # evidence for the touched plans (same policy as the r14 head).
    "dedup_exact_substring",  # r15 continuation (scan parallelism)
    "dedup_minhash_lsh",  # r15 continuation (scan parallelism)
    "similarity_join_corpus",  # r15 continuation (scan parallelism)
    "corpus_doc_embedding_hybrid_dedup",  # r15 continuation (scan parallelism)
    "entity_resolution_customers",  # r15 continuation (scan parallelism)
    "window_navigation_suite",  # r9
    "array_functions_suite",  # r10
    "basket_part_cooccurrence",  # r10
    "bitwise_agg_suite",  # r10
    "bucketed_fact_join",  # r10
    "cohort_retention_weekly",  # r10
    "corpus_boilerplate_rewrite",  # r10
    "corpus_decontamination_bloom",  # r10
    "corpus_reservoir_sample",  # r10
    "corpus_tfidf_topterms",  # r10
    "corpus_train_val_test_split",  # r10
    "corpus_training_build",  # r10
    "corpus_unigram_stats",  # r10
    "dedup_connected_components",  # r10
    "dedup_semantic_clusters",  # r10
    "event_funnel_conversion",  # r10
    "feature_outlier_fences",  # r10
    "max_drawdown_per_symbol",  # r10
    "ohlc_hourly_resample",  # r10
    "regex_functions_suite",  # r10
    "schema_evolution_scan",  # r10
    "sma_crossover_signals",  # r10
    "streaming_ohlc_bars",  # r10
    "streaming_sliding_sums",  # r10
    "streaming_static_enrich",  # r10
    "streaming_stream_stream_join",  # r10
    "streaming_stream_stream_left_join",  # r10
    "streaming_tumbling_counts",  # r10
    "streaming_tumbling_counts_rocksdb",  # r10
    "symbol_validation",  # r10
    "text_quality_stats",  # r10
    "text_repetition_stats",  # r10
    "topk_movers_per_day",  # r10
    "tpch_q12_shipmode",  # r10
    "tpch_q14_promo_share",  # r10
    # (tpch_q15/q16/q17/q18/q20 rotated out to make room for the five
    # continuation-touched plans above — they stay covered every
    # pytest run by tests/test_oracle_parity.py's full-registry loop.)
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
