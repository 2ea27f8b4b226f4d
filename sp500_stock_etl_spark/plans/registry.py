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
    # --- r11 window. Policy unchanged (r7/r8/r9/r10): births at the
    # head the moment they land; every remaining slot is the
    # stalest-green fill GENERATED from the CORRECTNESS union by
    # `scripts/coverage_report.py` (stalest_ok, oracle-bearing only).
    # Generated 2026-08-15 after CORRECTNESS_r10 (zero debts pending:
    # never_checked = [the r11 birth], oracle_upgraded_pending = [],
    # ever_error = []): one r5 straggler (xml_roundtrip_agg, displaced
    # by the r10 birth last round), then the r6 band — next stalest
    # after these fills: dedup_prefix_jaccard (r7).
    "streaming_cdc_upsert_tenant",  # r11 birth: composite-tenant CDC store
    "streaming_cdc_upsert_filestats",  # r11 birth: file-level CDC merge
    "xml_roundtrip_agg",  # r5
    "abc_pareto_classification",  # r6
    "asof_join_forward",  # r6
    "asof_join_nearest",  # r6
    "asof_join_tolerance",  # r6
    "batch_sessionization",  # r6
    "corpus_bigram_lm",  # r6
    "corpus_budget_fill",  # r6
    "corpus_curation_pipeline",  # r6
    "corpus_curation_v2",  # r6
    "corpus_decontamination_overlap",  # r6
    "corpus_domain_mix_report",  # r6
    "corpus_lm_quality_score",  # r6
    "corpus_pagerank",  # r6
    "corpus_url_canonical_dedup",  # r6
    "dedup_connected_components_star",  # r6
    "dedup_keep_best_quality",  # r6
    "dedup_minhash_lsh",  # r6
    "dedup_simhash",  # r6
    "embedding_quantize_int8",  # r6
    "entity_resolution_customers",  # r6
    "fact_fact_join",  # r6
    "feature_equidepth_histogram",  # r6
    "feature_histogram_bins",  # r6
    "filtered_scan_projection",  # r6
    "flagship_window_metrics",  # r6
    "gap_fill_forward",  # r6
    "gap_fill_interpolate",  # r6
    "global_sort_topk",  # r6
    "grouping_sets_agg",  # r6
    "hourly_event_agg",  # r6
    "interval_overlap_agg",  # r6
    "jsonl_sink_roundtrip_agg",  # r6
    "merge_upsert_customers",  # r6
    "multimodal_decode_dims",  # r6
    "qa_aggregate",  # r6
    "rollup_agg",  # r6
    "similarity_lsh_topk",  # r6
    "sql_api_shipping_priority",  # r6
    "streaming_jsonl_sink_roundtrip",  # r6
    "streaming_ohlc_bars_append",  # r6
    "text_lang_id",  # r6
    "token_frequency_topn",  # r6
    "tpch_q6_forecast_revenue",  # r6
    "union_all_distinct",  # r6
    "window_deduped_latest_snapshot",  # r6
    "zorder_layout_stats",  # r6
    "zorder_pruning_demo",  # r6
    # (asof_join_events, r7, was the 50th fill until the continuation
    # session's birth streaming_cdc_upsert_tenant took the head slot —
    # births displace the newest fill, per standing policy.)
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
