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
    # --- r12 window. Policy unchanged (r7..r11): births at the head
    # the moment they land; every remaining slot is the stalest-green
    # fill GENERATED from the CORRECTNESS union by
    # `scripts/coverage_report.py` (stalest_ok, oracle-bearing only).
    # Generated 2026-08-16 after CORRECTNESS_r11 (zero debts pending:
    # never_checked = [], oracle_upgraded_pending = [], ever_error =
    # []): the r12 birth at the head (standing policy), then the r7
    # band — the block the r11 verdict item 2 named; the birth
    # displaces the newest fill (tpcds_q97_channel_overlap). Next
    # stalest after these: the displaced q97, then the r8 block.
    "streaming_cdc_upsert_sharded",  # r12 birth: sharded-manifest CDC store
    "asof_join_events",  # r7
    "conditional_agg_suite",  # r7
    "corpus_balanced_sample",  # r7
    "corpus_bpe_encode",  # r7
    "corpus_decontamination",  # r7
    "corpus_doc_embedding_hybrid_dedup",  # r7
    "corpus_mix_sample",  # r7
    "corpus_pii_redaction",  # r7
    "corpus_token_budget",  # r7
    "date_parts_agg",  # r7
    "dedup_exact_substring",  # r7
    "dedup_incremental_refresh",  # r7
    "dedup_ngram_jaccard",  # r7
    "dedup_prefix_jaccard",  # r7
    "dedup_signature_store_roundtrip",  # r7
    "doc_fingerprint",  # r7
    "dq_quarantine_rows",  # r7
    "dq_violation_counts",  # r7
    "embedding_pq_encode_init",  # r7
    "exact_quantiles",  # r7
    "grouped_agg_pricing_decimal",  # r7
    "hierarchical_rollup_daily",  # r7
    "incremental_agg_maintenance",  # r7
    "json_props_agg",  # r7
    "jsonl_source_agg",  # r7
    "kmeans_assign_init",  # r7
    "map_entries_agg",  # r7
    "multimodal_audio_chunk_plan",  # r7
    "multimodal_frame_sample",  # r7
    "multimodal_resize_plan",  # r7
    "multimodal_video_decode",  # r7
    "percent_of_total",  # r7
    "quote_feed_source_agg",  # r7
    "range_interval_join",  # r7
    "range_window_trailing_spend",  # r7
    "ranking_function_suite",  # r7
    "recursive_cte_calendar",  # r7
    "similarity_bruteforce_topk",  # r7
    "similarity_ivf_topk",  # r7
    "skew_salted_join",  # r7
    "star_chain_q5",  # r7
    "streaming_corpus_curation",  # r7
    "streaming_corpus_dedup",  # r7
    "streaming_stream_stream_full_join",  # r7
    "tpcds_q51_cumulative_max",  # r7
    "tpcds_q67_rollup_topk",  # r7
    "tpcds_q73_basket_counts",  # r7
    "tpcds_q88_multiband_counts",  # r7
    "tpcds_q93_returns_adjusted",  # r7
    # (tpcds_q97_channel_overlap, r7, was the 50th fill until the r12
    # birth took the head slot — births displace the newest fill.)
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
