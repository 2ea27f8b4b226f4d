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
    # --- r14 window. Policy unchanged (r7..r13): births at the head
    # the moment they land; every remaining slot is the stalest-green
    # fill GENERATED from the CORRECTNESS union by
    # `scripts/coverage_report.py` (stalest_ok, oracle-bearing only).
    # Generated 2026-08-16 after CORRECTNESS_r13 (zero debts pending:
    # never_checked = [], oracle_upgraded_pending = [], ever_error =
    # []): exactly the band the r13 verdict item 1 named — the
    # displaced unpivot_measures_long (r8), then the r9 block
    # (arrow_udtf_installments and the r9-refreshed r3/r4 fills:
    # TPC-H Q4/Q10/Q11/Q13/Q19/Q22, the join family, the streaming
    # dedup/quote-feed plans, the multimodal execute pair). No r14
    # births yet; any that land take the head and displace the
    # newest fill.
    "unpivot_measures_long",  # r8
    "anti_join_customers",  # r9
    "approx_monitoring_profile",  # r9
    "arrow_udtf_installments",  # r9
    "broadcast_star_join",  # r9
    "corpus_boilerplate_segments",  # r9
    "corpus_chunking",  # r9
    "corpus_sequence_packing",  # r9
    "correlated_subqueries",  # r9
    "cross_join_dims",  # r9
    "csv_roundtrip_agg",  # r9
    "cube_agg",  # r9
    "dedup_embedding_cosine",  # r9
    "dedup_exact",  # r9
    "full_outer_reconciliation",  # r9
    "grouped_agg_pricing",  # r9
    "grouped_map_value_diff",  # r9
    "left_outer_enrichment",  # r9
    "multimodal_decode_features",  # r9
    "multimodal_metadata_agg",  # r9
    "multimodal_pcm_chunk_execute",  # r9
    "multimodal_resize_execute",  # r9
    "null_safe_join",  # r9
    "orc_roundtrip_agg",  # r9
    "pivot_event_counts",  # r9
    "ranking_top3_per_flag",  # r9
    "rolling_avg_sma7",  # r9
    "scd2_event_history",  # r9
    "semi_join_customers",  # r9
    "session_window_agg",  # r9
    "set_ops_cohorts",  # r9
    "similarity_ivf_topk_nprobe2",  # r9
    "similarity_join_corpus",  # r9
    "streaming_dedup_keys",  # r9
    "streaming_dedup_keys_ttl",  # r9
    "streaming_quote_feed_agg",  # r9
    "streaming_stream_stream_right_join",  # r9
    "string_functions_suite",  # r9
    "token_heavy_hitters_sketch",  # r9
    "tpcds_q14_cross_channel_items",  # r9
    "tpcds_q38_channel_intersect",  # r9
    "tpcds_q87_channel_except",  # r9
    "tpch_q10_returned_items",  # r9
    "tpch_q11_important_parts",  # r9
    "tpch_q13_custdist",  # r9
    "tpch_q19_disjunctive_join",  # r9
    "tpch_q22_idle_segments",  # r9
    "tpch_q4_priority_exists",  # r9
    "variant_json_agg",  # r9
    "weighted_avg_pricing",  # r9
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
