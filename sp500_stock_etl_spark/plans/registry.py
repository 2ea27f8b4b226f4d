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
# each round (round-2 verdict item 1). Round-6 policy (round-5 verdict
# items 1-2): (a) the one never-green repair and the five queries that
# landed after the final r5 rotation head the window; (b) a small core
# regression set covering every family stays pinned; (c) queries BORN
# this round are inserted here the moment they are registered —
# displacing a stale fill from the tail — so "added after rotation"
# debt cannot recur; (d) remaining slots go to the stalest r2-only
# greens. Rotation never un-verifies anything locally: every registry
# oracle is re-checked on every pytest run by
# tests/test_oracle_parity.py (full-registry parametrize), and output
# schemas are swept by tests/test_schema_audit.py.
_PRIORITY: tuple[str, ...] = (
    # --- r5 driver ERROR, repaired this round: q_embedding is now
    # --- final-projected through array_join so the canonicalizer
    # --- never sees a top-level array (the r4/r5 crash class, closed
    # --- registry-wide by tests/test_schema_audit.py) ---
    "embedding_quantize_int8",
    # --- Never driver-checked (landed after the final r5 rotation) ---
    "zorder_layout_stats",
    "corpus_bpe_merges",
    "asof_join_tolerance",
    "asof_join_forward",
    "dedup_connected_components_star",
    # --- Core regression set (one per family; the append-mode OHLC
    # --- twin replaces the complete-mode device per r5 verdict item 8;
    # --- entity_resolution_customers re-checks under its r6
    # --- high-cardinality blocking rework) ---
    "flagship_window_metrics",  # reference flagship (windows W1-W3)
    "similarity_lsh_topk",  # ANN family
    "corpus_curation_pipeline",  # LLM-pipeline capstone
    "streaming_ohlc_bars_append",  # streaming family (append-mode core)
    "multimodal_decode_dims",  # multimodal real-header decode
    "dedup_minhash_lsh",  # near-dup family
    "qa_aggregate",  # reference QA aggregate
    "entity_resolution_customers",  # r6 blocking rework re-check
    # --- New round-6 queries (first driver rows; inserted at birth) ---
    "asof_join_nearest",
    "window_deduped_latest_snapshot",
    "merge_upsert_customers",
    "feature_histogram_bins",
    "corpus_domain_mix_report",
    "corpus_url_canonical_dedup",
    "interval_overlap_agg",
    "corpus_bigram_lm",
    "zorder_pruning_demo",
    "corpus_pagerank",
    "corpus_bpe_encode",  # rows-only by design (iterative train half)
    "corpus_lm_quality_score",
    "embedding_pq_codebooks",  # rows-only by design (kmeans family)
    "jsonl_sink_roundtrip_agg",
    "corpus_curation_v2",
    "dedup_keep_best_quality",
    "corpus_budget_fill",
    "streaming_jsonl_sink_roundtrip",
    "gap_fill_interpolate",
    "corpus_decontamination_overlap",
    "feature_equidepth_histogram",
    # --- Stalest greens (last driver row r2) ---
    "filtered_scan_projection",
    "global_sort_topk",
    "union_all_distinct",
    "rollup_agg",
    "fact_fact_join",
    "hourly_event_agg",
    "sql_api_shipping_priority",
    "tpch_q6_forecast_revenue",
    "grouping_sets_agg",
    "batch_sessionization",
    "gap_fill_forward",
    "token_frequency_topn",
    "abc_pareto_classification",  # r6 distributed-cumsum rework re-check
    "dedup_simhash",
    "text_lang_id",
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

    ordered: dict[str, Query] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
