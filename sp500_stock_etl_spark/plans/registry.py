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
# each round (round-2 verdict item 1). Round-7 policy (round-6 verdict
# item 1): (a) queries BORN this round — and queries whose oracle was
# UPGRADED this round (the BPE/PQ encode halves) — are inserted at the
# head the moment they land, so after-rotation debt cannot recur;
# (b) every remaining slot is the stalest-green fill, GENERATED from
# the CORRECTNESS union by `scripts/coverage_report.py` (stalest_ok,
# oracle-bearing entries only) — argmin(latest green round), ties by
# name. Rotation never un-verifies anything locally: every registry
# oracle is re-checked on every pytest run by
# tests/test_oracle_parity.py (full-registry parametrize), and output
# schemas are swept by tests/test_schema_audit.py.
_PRIORITY: tuple[str, ...] = (
    # --- Round-7 births / oracle upgrades (inserted at birth) ---
    "corpus_bpe_encode",  # r7: encode half gains a composed-CTE oracle
    "embedding_pq_encode_init",  # r7: deterministic iters=0 PQ twin, full SQL
    "dedup_incremental_refresh",  # r7: signature-store incremental dedup
    "tpcds_q67_rollup_topk",  # r7: TPC-DS-shaped rollup x window
    "tpcds_q51_cumulative_max",  # r7: TPC-DS-shaped cumulative-max cross
    "dedup_signature_store_roundtrip",  # r7: persisted band-signature store
    "corpus_doc_embedding_hybrid_dedup",  # r7: lexical+embedding agreement
    "dedup_exact_substring",  # r7: Lee-et-al span dedup
    "kmeans_assign_init",  # r7: deterministic assignment twin
    "tpcds_q97_channel_overlap",  # r7: full-outer channel census
    "streaming_stream_stream_full_join",  # r7: completes the family
    "incremental_agg_maintenance",  # r7: materialized-rollup twin
    "multimodal_resize_plan",  # r7: vision resize planning
    "tpcds_q88_multiband_counts",  # r7: scalar-subquery band grid
    "tpcds_q73_basket_counts",  # r7: group-count range + joinback
    "tpcds_q93_returns_adjusted",  # r7: returns netting
    # --- Stalest-green fill (generated 2026-08-14 from
    # --- CORRECTNESS_r01..r06 by scripts/coverage_report.py; latest
    # --- green round shown; oracle-bearing queries only — rows-only
    # --- classes are invariant-tested locally instead) ---
    "date_parts_agg",  # r2
    "dedup_ngram_jaccard",  # r2
    "doc_fingerprint",  # r2
    "hierarchical_rollup_daily",  # r2
    "json_props_agg",  # r2
    "jsonl_source_agg",  # r2
    "map_entries_agg",  # r2
    "range_window_trailing_spend",  # r2
    "similarity_bruteforce_topk",  # r2
    "similarity_ivf_topk",  # r2
    "asof_join_events",  # r3
    "conditional_agg_suite",  # r3
    "corpus_balanced_sample",  # r3
    "corpus_decontamination",  # r3
    "corpus_mix_sample",  # r3
    "corpus_pii_redaction",  # r3
    "corpus_token_budget",  # r3
    "dedup_prefix_jaccard",  # r3
    "dq_quarantine_rows",  # r3
    "dq_violation_counts",  # r3
    "exact_quantiles",  # r3
    "grouped_agg_pricing_decimal",  # r3
    "multimodal_audio_chunk_plan",  # r3
    "multimodal_frame_sample",  # r3
    "multimodal_video_decode",  # r3
    "percent_of_total",  # r3
    "quote_feed_source_agg",  # r3
    "range_interval_join",  # r3
    "ranking_function_suite",  # r3
    "recursive_cte_calendar",  # r3
    "skew_salted_join",  # r3
    "star_chain_q5",  # r3
    "streaming_corpus_curation",  # r3
    "streaming_corpus_dedup",  # r3
    # (streaming_quote_feed_agg / string_functions_suite /
    # tpch_q10_returned_items / tpch_q11_important_parts /
    # tpch_q13_custdist / tpch_q19_disjunctive_join /
    # tpch_q22_idle_segments / tpch_q4_priority_exists /
    # variant_json_agg / weighted_avg_pricing /
    # window_navigation_suite, the eleven least-stale r3 fills, were
    # displaced by r7 births — still re-verified every pytest run
    # like all non-window queries.)
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

    ordered: dict[str, Query] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
