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
    # --- r13 window. Policy unchanged (r7..r12): births at the head
    # the moment they land; every remaining slot is the stalest-green
    # fill GENERATED from the CORRECTNESS union by
    # `scripts/coverage_report.py` (stalest_ok, oracle-bearing only).
    # Generated 2026-08-16 after CORRECTNESS_r12 (zero debts pending:
    # never_checked = [], oracle_upgraded_pending = [], ever_error =
    # []): exactly the band the r12 verdict item 3 named — the
    # displaced tpcds_q97_channel_overlap (r7), then the r8 block
    # (arrow_* stats, basket rules, the indicator suite, streaming
    # session/vwap family, tpcds r8 entries). No r13 births yet; any
    # that land take the head and displace the newest fill.
    "tpcds_q97_channel_overlap",  # r7
    "arrow_grouped_apply_stats",  # r8
    "arrow_native_batch_stats",  # r8
    "arrow_scalar_udf_stats",  # r8
    "basket_association_rules",  # r8
    "corpus_domain_mixture",  # r8
    "indicator_advance_decline",  # r8
    "indicator_bollinger_bands",  # r8
    "indicator_candle_patterns",  # r8
    "indicator_cusum_changepoint",  # r8
    "indicator_drawdown_duration",  # r8
    "indicator_ewma_fold",  # r8
    "indicator_expected_shortfall",  # r8
    "indicator_market_beta",  # r8
    "indicator_max_drawdown",  # r8
    "indicator_obv",  # r8
    "indicator_portfolio_hhi",  # r8
    "indicator_portfolio_var",  # r8
    "indicator_risk_report",  # r8
    "indicator_rsi_cutler",  # r8
    "indicator_runs_test",  # r8
    "indicator_sma_backtest",  # r8
    "indicator_stochastic_k",  # r8
    "indicator_trend_slope",  # r8
    "indicator_twap_irregular",  # r8
    "indicator_vwap_daily",  # r8
    "lateral_topk_per_customer",  # r8
    "listagg_supplier_directory",  # r8
    "multimodal_adpcm_decode_execute",  # r8
    "multimodal_jpeg_decode_execute",  # r8
    "multimodal_mjpeg_frame_decode",  # r8
    "quality_classifier_inference",  # r8
    "quality_threshold_calibration",  # r8
    "quantile_sketch_certificate",  # r8
    "recursive_bom_rollup",  # r8
    "recursive_functional_walk",  # r8
    "session_window_dynamic_gap",  # r8
    "sql_udf_order_cents",  # r8
    "streaming_cdc_upsert_multibatch",  # r8
    "streaming_quality_classifier",  # r8
    "streaming_running_totals_final",  # r8
    "streaming_session_dynamic_gap",  # r8
    "streaming_session_windows",  # r8
    "streaming_sessions_multibatch",  # r8
    "streaming_vwap_daily",  # r8
    "tpcds_q36_rollup_rank",  # r8
    "tpcds_q49_dual_rank_report",  # r8
    "tpcds_q51_cumulative_crossover",  # r8
    "tpcds_q57_monthly_deviation",  # r8
    "tpcds_q80_channel_netting",  # r8
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
