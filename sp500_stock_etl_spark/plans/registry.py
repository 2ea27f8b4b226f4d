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
# each round (round-2 verdict item 1). Round-9 policy (unchanged from
# r7/r8): (a) queries BORN this round — and queries whose oracle was
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
    # --- r9 birth (inserted at birth, displacing the last stalest
    # --- fill streaming_sliding_sums to keep exactly 50):
    "arrow_udtf_installments",  # r9: Arrow UDTF lateral fan-out
    # --- r9 debt head (round-8 verdict item 1): the SIX r8 births the
    # --- 50-slot window could never fit (each pytest- and sf0.1-sweep
    # --- green, never driver-checked) ...
    "multimodal_resize_execute",  # real PNG decode + NN resample
    "multimodal_pcm_chunk_execute",  # real WAV PCM chunk stats
    "tpcds_q38_channel_intersect",  # 3-channel INTERSECT census
    "tpcds_q87_channel_except",  # EXCEPT/anti-join twin
    "tpcds_q14_cross_channel_items",  # INTERSECT under aggregation
    "streaming_stream_stream_right_join",  # 4th outer-join mode
    # --- ... plus the THREE r8 oracle UPGRADES whose only driver rows
    # --- predate the upgrade (r2-era rows-only):
    "multimodal_decode_features",  # upgraded: hex-rebuild histogram oracle
    "token_heavy_hitters_sketch",  # upgraded: certificate oracle
    "approx_monitoring_profile",  # upgraded: HLL/percentile certificate
    # --- stalest-green fill, generated 2026-08-15 from
    # --- `scripts/coverage_report.py` stalest_ok after CORRECTNESS_r08
    # --- (oracle-bearing only; r3-era rows first, then r4):
    "streaming_quote_feed_agg",  # r3
    "string_functions_suite",  # r3
    "tpch_q10_returned_items",  # r3
    "tpch_q11_important_parts",  # r3
    "tpch_q13_custdist",  # r3
    "tpch_q19_disjunctive_join",  # r3
    "tpch_q22_idle_segments",  # r3
    "tpch_q4_priority_exists",  # r3
    "variant_json_agg",  # r3
    "weighted_avg_pricing",  # r3
    "window_navigation_suite",  # r3
    "anti_join_customers",  # r4
    "broadcast_star_join",  # r4
    "corpus_boilerplate_segments",  # r4
    "corpus_chunking",  # r4
    "corpus_sequence_packing",  # r4
    "correlated_subqueries",  # r4
    "cross_join_dims",  # r4
    "csv_roundtrip_agg",  # r4
    "cube_agg",  # r4
    "dedup_embedding_cosine",  # r4
    "dedup_exact",  # r4
    "full_outer_reconciliation",  # r4
    "grouped_agg_pricing",  # r4
    "grouped_map_value_diff",  # r4
    "left_outer_enrichment",  # r4
    "multimodal_metadata_agg",  # r4
    "null_safe_join",  # r4
    "orc_roundtrip_agg",  # r4
    "pivot_event_counts",  # r4
    "ranking_top3_per_flag",  # r4
    "rolling_avg_sma7",  # r4
    "scd2_event_history",  # r4
    "semi_join_customers",  # r4
    "session_window_agg",  # r4
    "set_ops_cohorts",  # r4
    "similarity_ivf_topk_nprobe2",  # r4
    "similarity_join_corpus",  # r4
    "streaming_dedup_keys",  # r4
    "streaming_dedup_keys_ttl",  # r4
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
