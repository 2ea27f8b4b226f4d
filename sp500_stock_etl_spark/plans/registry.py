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
# 50 registry entries against their DuckDB oracles. Round 3 ROTATES the
# window (round-2 verdict item 1): a ~15-query core regression set that
# covers every family stays pinned, and the remaining slots go to queries
# that have never had a driver row (round-2 additions, TPC-H tail,
# relational suites). Queries not listed here follow in
# module-registration order; tests/test_oracle_parity.py still checks the
# FULL registry every run, so rotation never un-verifies anything locally.
_PRIORITY: tuple[str, ...] = (
    # --- Core regression set (one per family, all green in r01/r02) ---
    "flagship_window_metrics",  # reference flagship (windows W1-W3)
    "qa_aggregate",  # reference QA aggregate (A1-A5)
    "symbol_validation",  # reference validity predicates (P1-P8)
    "csv_roundtrip_agg",  # Snowflake-semantics CSV scan + QUOTE_ALL write
    "orc_roundtrip_agg",  # warehouse bulk load + idempotent reload (K3)
    "topk_movers_per_day",  # global sort / top-k (O1-O3)
    "dedup_minhash_lsh",  # dedup family
    "dedup_embedding_cosine",  # embedding near-dup (banded SRP this round)
    "similarity_lsh_topk",  # ANN family (banded SRP this round)
    "text_quality_stats",  # text-analysis family
    "corpus_curation_pipeline",  # LLM-pipeline capstone
    "streaming_tumbling_counts",  # streaming family
    "multimodal_decode_dims",  # multimodal real-header decode
    "broadcast_star_join",  # join family
    "grouped_agg_pricing",  # grouped agg + rounding kernel
    # --- New this round ---
    "grouped_agg_pricing_decimal",  # decimal(18,4) money-typed twin
    # --- Never driver-checked before round 3 ---
    "dedup_prefix_jaccard",
    "corpus_pii_redaction",
    "corpus_decontamination",
    "corpus_token_budget",
    "corpus_balanced_sample",
    "corpus_mix_sample",
    "quote_feed_source_agg",
    "streaming_quote_feed_agg",
    "streaming_corpus_dedup",
    "streaming_corpus_curation",
    "tpch_q4_priority_exists",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q13_custdist",
    "tpch_q19_disjunctive_join",
    "tpch_q22_idle_segments",
    "weighted_avg_pricing",
    "percent_of_total",
    "star_chain_q5",
    "multimodal_video_decode",
    "multimodal_audio_chunk_plan",
    "multimodal_frame_sample",
    "dq_violation_counts",
    "dq_quarantine_rows",
    "recursive_cte_calendar",
    "variant_json_agg",
    "asof_join_events",
    "skew_salted_join",
    "range_interval_join",
    "exact_quantiles",
    "string_functions_suite",
    "window_navigation_suite",
    "ranking_function_suite",
    "conditional_agg_suite",
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
