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
# covering every family stays pinned; round 4 gives the remaining slots
# to (a) everything that has never had a driver row — including this
# round's five new queries — and (b) the STALEST greens (r1-only, then
# r2-only), so every registry query's driver evidence stays fresh.
# Round-3's 34 first-row queries keep their r3 rows and remain covered
# every run by tests/test_oracle_parity.py (full-registry parametrize),
# so rotation never un-verifies anything locally.
_PRIORITY: tuple[str, ...] = (
    # --- Core regression set (one per family) ---
    "flagship_window_metrics",  # reference flagship (windows W1-W3)
    "qa_aggregate",  # reference QA aggregate (A1-A5)
    "symbol_validation",  # reference validity predicates (P1-P8)
    "csv_roundtrip_agg",  # Snowflake-semantics CSV scan + QUOTE_ALL write
    "orc_roundtrip_agg",  # warehouse bulk load + idempotent reload (K3)
    "topk_movers_per_day",  # global sort / top-k (O1-O3)
    "dedup_minhash_lsh",  # dedup family
    "dedup_embedding_cosine",  # embedding near-dup (pair-dedup rework, r4)
    "similarity_lsh_topk",  # ANN family (pair-dedup rework, r4)
    "text_quality_stats",  # text-analysis family
    "corpus_curation_pipeline",  # LLM-pipeline capstone
    "streaming_tumbling_counts",  # streaming family
    "multimodal_decode_dims",  # multimodal real-header decode
    "broadcast_star_join",  # join family
    "grouped_agg_pricing",  # grouped agg + rounding kernel
    # --- Never driver-checked (round-4 additions + the last two
    # --- stragglers; multimodal_decode_features and the running-totals
    # --- TTL twin are rows-only by design) ---
    "array_functions_suite",
    "multimodal_decode_features",
    "similarity_ivf_topk_nprobe2",
    "weighted_avg_pricing_decimal",
    "streaming_dedup_keys_ttl",
    "streaming_tumbling_counts_rocksdb",
    "streaming_running_user_totals_ttl",
    # --- Stalest greens: r1-only rows (no driver row since round 1) ---
    "cube_agg",
    "semi_join_customers",
    "anti_join_customers",
    "ranking_top3_per_flag",
    "rolling_avg_sma7",
    "set_ops_cohorts",
    "pivot_event_counts",
    "correlated_subqueries",
    "grouped_map_value_diff",
    "cross_join_dims",
    "unpivot_order_metrics",
    "udtf_split_sentences",
    "left_outer_enrichment",
    "full_outer_reconciliation",
    "null_safe_join",
    # --- New round-4 operators (first driver rows) ---
    "corpus_chunking",
    "corpus_boilerplate_segments",
    "corpus_sequence_packing",
    "scd2_event_history",
    # --- r2-only rows (no driver row since round 2; the four swapped
    # --- out for the new operators — dedup_simhash, similarity_ivf_topk,
    # --- text_lang_id, doc_fingerprint — keep their r2 rows and stay
    # --- pytest-checked every run) ---
    "dedup_exact",
    "similarity_join_corpus",
    "kmeans_embedding_clusters",
    "streaming_sliding_sums",
    "session_window_agg",
    "streaming_static_enrich",
    "streaming_dedup_keys",
    "streaming_stream_stream_join",
    "multimodal_metadata_agg",
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
