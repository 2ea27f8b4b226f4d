#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE compact JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...small...}, "sf": <sf>, "detail": "BENCH_DETAIL.json"}

Round-6 changes (round-5 verdict items 5-6):
- BENCH_r05.json was unparseable because the full per-query map
  outgrew the driver's 2000-char tail capture. The final stdout line
  is now COMPACT (headline values + per-section sums + counts,
  guaranteed < 1.5 KB); the full per-query timing map is written to
  ``BENCH_DETAIL.json`` at the repo root (committed per round).
- the round-5 additions are FOLDED INTO the recommended set — one
  fixed 70-plan headline from here on (the 47-plan r5 set + the 23
  ``queries_r5`` entries). Round-over-round anchor (BASELINE.md §7):
  r5 measured 47 plans = 42.25-46.0 s and the r5 section = 39.9-45.3 s
  across the day's clean runs; pre-registered folded anchor **82.1 s**
  over the 66-plan union at fold time (the last 4 r5 stragglers
  landed after that anchor was cut and add ~8 s — the detail file
  keeps every per-query number so the union is diffable exactly).

Execution is measured with the noop sink (full plan runs, no
driver-side result transfer). A small warmup query absorbs JVM/codegen
startup; recommended plans are timed best-of-2 to damp background-load
noise on the shared host.

Three queries are deliberate EXHIBITS — correctness baselines whose
plans are documented scale-killers, kept so the bucketed/declarative
variants have something to be measured against:

- grouped_map_value_diff: Arrow applyInPandas recomputing what
  flagship_window_metrics does declaratively;
- similarity_bruteforce_topk: broadcast x crossJoin full-corpus scan
  (baseline for similarity_lsh_topk / similarity_ivf_topk);
- dedup_ngram_jaccard: exact all-pairs baseline (run at sf0.01 — its
  argument is the RATIO vs the bucketed/prefix plans, r4 decision).

They are timed once and reported in the detail file under
``exhibits``; excluded from the headline number.

Round-7 fold (round-6 verdict item 1): the 21 ``queries_r6``
entries are folded into ONE fixed 91-plan recommended suite.
Pre-registered anchor from BENCH_r06.json: 81.157 s (70 plans) +
28.818 s (r6 section) = **109.975 s for the same 91-plan union**;
BENCH_r07 measured 100.438 s on it (9% better, zero per-query
regressions).

Round-8 fold (round-7 verdict item 1): the 15 ``queries_r7``
entries are folded into ONE fixed 106-plan recommended suite.
Pre-registered anchor from BENCH_r07.json (the driver artifact's
15-plan section, not SURVEY prose): 100.438 s (91 plans) +
26.174 s (r7 section) = **126.612 s for the same 106-plan union** —
BENCH_r08 measured 159.233 s on the driver box (1.26x); the judge's
like-for-like per-query diff attributed the gap to measurement
protocol + box load (common-plan sums 1.00x quiet / 1.09x driver).

Round-9 fold (round-8 verdict item 3): the 57 ``queries_r8`` entries
are folded into ONE fixed 163-plan recommended suite. Pre-registered
anchor from BENCH_r08.json (the driver artifact): 159.233 s
(106 plans) + 86.167 s (r8 section) = **245.400 s for the same
163-plan union** on the DRIVER box, with the quiet continuation-close
pair 145.8 + 72.9 = **218.7 s** recorded alongside — BENCH_r09's
``value`` compares against the driver anchor like-for-like. This
round's new queries report under ``queries_r9`` until the r10 fold.

Round-10 growth policy (round-9 verdict item 6 — pinned BEFORE the
suite hits 10 min). The suite grew 70→91→106→163→164 plans across
five folds (~208 s at r9); unbounded folding eventually caps either
coverage or comparability. From r10 the headline splits in two:

- ``value`` = the **55-plan HEADLINE CORE** (``CORE_QUERIES``): the
  reference surface plus exactly one representative per operator
  family (joins/aggs/windows/dedup/similarity/text/streaming/
  multimodal/indicators/arrow/incremental/graph/recursive/TPC).
  FIXED FOREVER — this is the like-for-like anchor across all future
  rounds. Pre-registered core anchor from the BENCH_r09 driver
  detail: **64.601 s** (sum of the same 55 plans in that artifact).
- ``value_full_suite`` = the full folded union (164 plans at r10:
  163 + the r9 section folded in). Pre-registered anchor from
  BENCH_r09.json: 207.968 + 1.924 = **209.892 s like-for-like**.
  New rounds' births keep folding in here (coverage is never capped).
  Round-11 fold: the one r10 birth (streaming_cdc_upsert_bucketed)
  joins the tail; pre-registered anchor from BENCH_r10.json:
  200.828 + 7.407 (value_new) = **208.235 s for the 165-plan union**.
- When the full suite exceeds 600 s wall, set
  ``SPARK_GRAFT_BENCH_TAIL=rotate``: the non-core tail then runs in
  deterministic halves (sorted-name index parity vs the round count
  gleaned from BENCH_r*.json files), so each tail plan is still
  measured every other round while the core stays every-round.
  ``tail_mode`` in the output records which mode ran.

Round-12 re-anchor (round-11 verdict item 1 — the host migrated
mid-r11, killing every old-host anchor). The two r11 births fold into
the 167-plan union AFTER their swing was bounded (filestats folds at
11.1-12.9 s across four runs; the r11 artifact's 36.4 s was store-
tempdir I/O contention, localized by scripts/
filestats_variance_probe.py). NEW-HOST anchors, pre-registered as the
median of three consecutive driver-protocol runs within +/-20%
(109.546/105.389/80.271 core; 339.639/350.971/272.815 full):
**core 105.389 s, full-suite 339.639 s**. The +/-35% band across four
runs is the microVM's PARALLEL-capacity swing (run 1 read 158.2 core
with a QUICK single-thread fingerprint of 144.9 ms — 30%+ system
time, 40k interrupts/s, idle cores mid-suite), which is why every
artifact now also stamps ``host_mt_ms`` (all-cores fingerprint;
healthy ~= host_st_ms x scaling loss, reads far above it when the
box is contended). Like-for-like code delta vs the r11 committed
detail: median per-query ratio 1.011 (runs 2/3 best) and 0.864
(run 4) — round-12 code is at or better than r11 parity.

Round-13 fold + streaming split (round-12 verdict items 2 and 4):
``streaming_cdc_upsert_sharded`` folds into the full suite at its
r12 driver-artifact measurement 13.729 s (inside/below its
pre-registered 20.0-29.6 s band) — full-suite anchor becomes
**353.368 s for the 168-plan union**; core unchanged. And because
the r12 artifact's entire 1.09x full-suite overshoot sat in
micro-batch SCHEDULING (stream-stream joins 2x their quiet numbers
while batch plans held ~1.1x), a StreamingQueryListener now
attributes, per streaming plan, ``batches`` + summed
``triggerExecution`` (the data wall) vs ``sched_wall_s`` (= plan
wall − exec; scheduler/startup share). BENCH_DETAIL.json carries the
per-plan split under ``streaming_split`` and the compact line carries
the suite-level ``stream_sched_wall_s``/``stream_exec_s`` — judge the
full-suite ratio net of the scheduling term.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

# Documented baseline/exhibit plans — timed but excluded from the
# headline total (see module docstring).
EXHIBIT_QUERIES = {
    "grouped_map_value_diff",
    "similarity_bruteforce_topk",
    "dedup_ngram_jaccard",
}

# One per operator family (BASELINE.md bench set). Fixed 163-plan
# recommended suite since round 9: the 106-plan r8 set plus the 57
# round-8 additions, folded per round-8 verdict item 3.
BENCH_QUERIES = [
    "flagship_window_metrics",
    "filtered_scan_projection",
    "qa_aggregate",
    "grouped_agg_pricing",
    "rollup_agg",
    "broadcast_star_join",
    "fact_fact_join",
    "global_sort_topk",
    "union_all_distinct",
    "rolling_avg_sma7",
    "asof_join_events",
    "hourly_event_agg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_bruteforce_topk",
    "similarity_lsh_topk",
    "text_quality_stats",
    "session_window_agg",
    "streaming_tumbling_counts",
    "grouping_sets_agg",
    "exact_quantiles",
    "range_interval_join",
    "token_frequency_topn",
    "grouped_map_value_diff",
    "streaming_dedup_keys",
    "corpus_curation_pipeline",
    "star_chain_q5",
    "tpch_q6_forecast_revenue",
    "similarity_join_corpus",
    "gap_fill_forward",
    "dedup_ngram_jaccard",
    # --- round-4 additions (folded in round 5) ---
    "corpus_chunking",
    "corpus_boilerplate_segments",
    "corpus_sequence_packing",
    "dedup_connected_components",
    "similarity_ivf_topk_nprobe2",
    "sma_crossover_signals",
    "max_drawdown_per_symbol",
    "feature_outlier_fences",
    "scd2_event_history",
    "weighted_avg_pricing_decimal",
    "streaming_dedup_keys_ttl",
    "streaming_tumbling_counts_rocksdb",
    "embedding_quantize_int8",
    "token_heavy_hitters_sketch",
    "event_funnel_conversion",
    "cohort_retention_weekly",
    "corpus_training_build",
    "ohlc_hourly_resample",
    "vwap_per_symbol_day",
    # --- round-5 additions (folded in round 6) ---
    "tpch_q9_profit",
    "tpch_q12_shipmode",
    "streaming_ohlc_bars_append",
    "text_repetition_stats",
    "corpus_decontamination_bloom",
    "corpus_unigram_stats",
    "corpus_boilerplate_rewrite",
    "bucketed_fact_join",
    "streaming_stream_stream_left_join",
    "corpus_tfidf_topterms",
    "dedup_semantic_clusters",
    "dedup_prefix_jaccard",
    "xml_roundtrip_agg",
    "corpus_reservoir_sample",
    "corpus_train_val_test_split",
    "triangle_count_basket",
    "entity_resolution_customers",
    "schema_evolution_scan",
    "dedup_connected_components_star",
    "zorder_layout_stats",
    "corpus_bpe_merges",
    "asof_join_tolerance",
    "asof_join_forward",
    # --- round-6 additions (folded in round 7) ---
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
    "corpus_bpe_encode",
    "embedding_pq_codebooks",
    "corpus_lm_quality_score",
    "jsonl_sink_roundtrip_agg",
    "corpus_curation_v2",
    "dedup_keep_best_quality",
    "corpus_budget_fill",
    "streaming_jsonl_sink_roundtrip",
    "gap_fill_interpolate",
    "corpus_decontamination_overlap",
    "feature_equidepth_histogram",
    # --- round-7 additions (folded in round 8) ---
    "embedding_pq_encode_init",
    "dedup_incremental_refresh",
    "dedup_signature_store_roundtrip",
    "tpcds_q67_rollup_topk",
    "tpcds_q51_cumulative_max",
    "corpus_doc_embedding_hybrid_dedup",
    "dedup_exact_substring",
    "kmeans_assign_init",
    "tpcds_q97_channel_overlap",
    "streaming_stream_stream_full_join",
    "incremental_agg_maintenance",
    "multimodal_resize_plan",
    "tpcds_q88_multiband_counts",
    "tpcds_q73_basket_counts",
    "tpcds_q93_returns_adjusted",
    # --- round-8 additions (folded in round 9) ---
    "multimodal_resize_execute",
    "multimodal_pcm_chunk_execute",
    "streaming_stream_stream_right_join",
    "streaming_running_totals_final",
    "multimodal_decode_features",
    "tpcds_q38_channel_intersect",
    "tpcds_q87_channel_except",
    "tpcds_q14_cross_channel_items",
    "multimodal_jpeg_decode_execute",
    "multimodal_mjpeg_frame_decode",
    "quality_classifier_inference",
    "corpus_domain_mixture",
    "unpivot_measures_long",
    "streaming_quality_classifier",
    "quality_threshold_calibration",
    "multimodal_adpcm_decode_execute",
    "recursive_bom_rollup",
    "recursive_functional_walk",
    "lateral_topk_per_customer",
    "listagg_supplier_directory",
    "sql_udf_order_cents",
    "tpcds_q36_rollup_rank",
    "tpcds_q49_dual_rank_report",
    "quantile_sketch_certificate",
    "session_window_dynamic_gap",
    "streaming_session_windows",
    "arrow_native_batch_stats",
    "arrow_grouped_apply_stats",
    "arrow_scalar_udf_stats",
    "streaming_session_dynamic_gap",
    "streaming_sessions_multibatch",
    "basket_association_rules",
    "indicator_bollinger_bands",
    "indicator_rsi_cutler",
    "indicator_ewma_fold",
    "indicator_max_drawdown",
    "tpcds_q51_cumulative_crossover",
    "tpcds_q57_monthly_deviation",
    "indicator_advance_decline",
    "indicator_market_beta",
    "indicator_vwap_daily",
    "indicator_sma_backtest",
    "indicator_stochastic_k",
    "indicator_obv",
    "indicator_portfolio_var",
    "streaming_vwap_daily",
    "indicator_cusum_changepoint",
    "indicator_drawdown_duration",
    "indicator_candle_patterns",
    "indicator_runs_test",
    "indicator_twap_irregular",
    "indicator_trend_slope",
    "streaming_cdc_upsert_multibatch",
    "indicator_expected_shortfall",
    "indicator_portfolio_hhi",
    "indicator_risk_report",
    "tpcds_q80_channel_netting",
    # --- round-9 additions (folded in round 10) ---
    "arrow_udtf_installments",
    # --- round-10 addition (folded in round 11) ---
    "streaming_cdc_upsert_bucketed",
    # --- round-11 additions (folded in round 12; the filestats fold
    # value was re-measured quiet-box first per the r11 verdict —
    # steady ~15 s total / ~3 s per merge; the 36.4 s in the r11
    # artifact was store-tempdir I/O contention mid-suite, localized
    # by scripts/filestats_variance_probe.py's per-merge phases) ---
    "streaming_cdc_upsert_filestats",
    "streaming_cdc_upsert_tenant",
    # --- round-12 addition (folded in round 13 at the driver
    # artifact's measured 13.729 s — inside/below its pre-registered
    # 20.0-29.6 s band; new full-suite anchor = 339.639 + 13.729 =
    # **353.368 s for the 168-plan union**, r12 verdict item 4) ---
    "streaming_cdc_upsert_sharded",
]

# Round-13 additions, reported under a SEPARATE key so the full-suite
# number stays comparable round-over-round; folded at r14. Names not
# yet registered are skipped so the harness runs mid-build.
NEW_QUERIES: list[str] = []

# The 55-plan HEADLINE CORE (r10 growth policy, module docstring):
# reference surface + one per operator family, fixed forever; `value`
# is the sum over exactly these. Pre-registered anchor 64.601 s
# (same 55 plans in the BENCH_r09 driver detail). Every name must be
# in BENCH_QUERIES and not an exhibit.
CORE_QUERIES = [
    "flagship_window_metrics",
    "filtered_scan_projection",
    "qa_aggregate",
    "grouped_agg_pricing",
    "rollup_agg",
    "broadcast_star_join",
    "fact_fact_join",
    "global_sort_topk",
    "union_all_distinct",
    "rolling_avg_sma7",
    "asof_join_events",
    "hourly_event_agg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_lsh_topk",
    "text_quality_stats",
    "session_window_agg",
    "streaming_tumbling_counts",
    "exact_quantiles",
    "range_interval_join",
    "token_frequency_topn",
    "streaming_dedup_keys",
    "corpus_curation_pipeline",
    "star_chain_q5",
    "tpch_q6_forecast_revenue",
    "similarity_join_corpus",
    "gap_fill_forward",
    "corpus_chunking",
    "dedup_connected_components",
    "similarity_ivf_topk_nprobe2",
    "embedding_quantize_int8",
    "tpch_q9_profit",
    "corpus_tfidf_topterms",
    "dedup_prefix_jaccard",
    "corpus_pagerank",
    "corpus_bpe_encode",
    "merge_upsert_customers",
    "corpus_reservoir_sample",
    "triangle_count_basket",
    "dedup_incremental_refresh",
    "dedup_signature_store_roundtrip",
    "tpcds_q67_rollup_topk",
    "corpus_doc_embedding_hybrid_dedup",
    "incremental_agg_maintenance",
    "multimodal_resize_execute",
    "multimodal_decode_features",
    "multimodal_pcm_chunk_execute",
    "quality_classifier_inference",
    "recursive_bom_rollup",
    "arrow_grouped_apply_stats",
    "streaming_sessions_multibatch",
    "streaming_cdc_upsert_multibatch",
    "indicator_bollinger_bands",
    "indicator_risk_report",
    "arrow_udtf_installments",
]


# Host fingerprints (single-thread + all-cores) live in
# sp500_stock_etl_spark/hostinfo.py — every probe stamps the same
# pair; the module docstring carries the two incidents (r11 host
# migration, r12 parallel-capacity swing) that make BOTH necessary.
from sp500_stock_etl_spark.hostinfo import (  # noqa: E402
    host_mt_ms as _host_parallel_fingerprint_ms,
    host_st_ms as _host_fingerprint_ms,
)


class _StreamMeter:
    """Separates DATA-WALL from SCHEDULING-WALL for streaming plans
    (r12 verdict item 2): the r12 driver artifact's whole 1.09x
    full-suite overshoot sat in streaming plans whose sf0.1 cost is
    micro-batch scheduler machinery, not data work — stream-stream
    joins read 2x their quiet-run numbers while batch plans held
    ~1.1x. A StreamingQueryListener accumulates, per bench plan, the
    number of micro-batches and the sum of their ``triggerExecution``
    durations (the data wall); ``sched_wall_s = plan wall − exec_s``
    is then the scheduler/startup share, so anchor comparisons can
    subtract jitter that says nothing about the plans.

    Listener events are delivered on a background thread, so
    ``drain()`` waits (bounded) until every started query has
    terminated and the counters have gone quiet before a snapshot —
    the wait runs OUTSIDE the timed window."""

    def __init__(self) -> None:
        import threading

        self._lock = threading.Lock()
        self.batches = 0
        self.exec_ms = 0
        self.started = 0
        self.terminated = 0

    def reset(self) -> None:
        with self._lock:
            self.batches = 0
            self.exec_ms = 0
            self.started = 0
            self.terminated = 0

    def _snap(self) -> tuple:
        with self._lock:
            return (self.batches, self.exec_ms, self.started, self.terminated)

    def drain(self, timeout_s: float = 3.0) -> dict:
        deadline = time.perf_counter() + timeout_s
        prev = self._snap()
        while time.perf_counter() < deadline:
            time.sleep(0.05)
            cur = self._snap()
            if cur == prev and cur[2] == cur[3]:
                break
            prev = cur
        b, ms, s, t = self._snap()
        return {"batches": b, "exec_s": round(ms / 1000.0, 3), "queries": s}

    def listener(self):
        from pyspark.sql.streaming import StreamingQueryListener

        meter = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                with meter._lock:
                    meter.started += 1

            def onQueryProgress(self, event):
                try:
                    ms = int(
                        event.progress.durationMs.get("triggerExecution", 0)
                    )
                except Exception:
                    ms = 0
                with meter._lock:
                    meter.batches += 1
                    meter.exec_ms += ms

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                with meter._lock:
                    meter.terminated += 1

        return _L()


# The compact final line must survive the driver's 2000-char tail
# capture (round-5 incident): the line prints LAST, so it is intact in
# the tail iff its own length fits. Budget leaves a little headroom.
_LINE_BUDGET = 1980

# Family-prefix abbreviation for the per-core-query keys in the
# compact line (full 55 names are 1146 chars of keys alone — they do
# NOT fit the tail budget next to the fixed fields). The short->full
# map is emitted in BENCH_DETAIL.json under ``core_key_map`` and the
# two bench runs the driver makes (main + low-core) share it, so the
# PERF scaling block still matches keys exactly.
_KEY_PREFIXES: tuple[tuple[str, str], ...] = (
    ("streaming_", "st."),
    ("corpus_", "co."),
    ("dedup_", "dd."),
    ("indicator_", "in."),
    ("multimodal_", "mm."),
    ("similarity_", "si."),
    ("embedding_", "em."),
    ("tpcds_", "ds."),
    ("tpch_", "h."),
)


def _short_key(name: str) -> str:
    for prefix, abbrev in _KEY_PREFIXES:
        if name.startswith(prefix):
            return abbrev + name[len(prefix):]
    return name


def _compact_line(payload: dict, core_names: list[str]) -> str:
    """Serialize the compact bench line, degrading the per-core-query
    seconds map (r14 verdict item 1: the driver's PERF per_query/
    geomean/scaling blocks need real per-query timings, not section
    counts) before ever busting the tail-capture budget: 3-sig-digit
    values -> 2 decimals -> 1 decimal -> whole seconds -> counts-only.
    Counts keys stay in ``queries`` unconditionally (driver contract:
    entries are only ever ADDED, never removed)."""
    rungs = (
        lambda v: float("%.3g" % v),
        lambda v: round(v, 2),
        lambda v: round(v, 1),
        lambda v: int(round(v)),
        None,
    )
    for conv in rungs:
        q = dict(payload["queries"])
        if conv is not None:
            q.update(
                {
                    _short_key(n): conv(payload["_core_timings"][n])
                    for n in core_names
                    if n in payload["_core_timings"]
                }
            )
        line = json.dumps(
            {
                **{k: v for k, v in payload.items() if k != "_core_timings"},
                "queries": q,
            },
            separators=(",", ":"),
        )
        if len(line) <= _LINE_BUDGET:
            return line
    return line  # counts-only fallback always fits


def _fold_best_of(
    timings: dict[str, float],
    stream_split: dict[str, dict],
    name: str,
    wall: float,
    s: dict | None,
) -> None:
    """Fold a second best-of-2 run into the kept timings, keeping the
    streaming split CONSISTENT with the kept wall. ADVICE r13 (low):
    previously a faster second run whose listener drain produced no
    split (``s is None`` — events lost, or late past the drain
    timeout) kept the FIRST run's split against the SECOND run's
    wall, so that entry's ``sched_wall_s`` decomposed against a wall
    that was no longer the reported one and the suite-level
    ``stream_sched_wall_s``/``stream_exec_s`` no longer summed
    against ``full_suite``. A missing split is honest; a mismatched
    one is wrong — drop the stale entry when the kept wall has none."""
    if wall < timings[name]:
        timings[name] = wall
        if s is not None:
            stream_split[name] = s
        else:
            stream_split.pop(name, None)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("sp500-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    meter = _StreamMeter()
    try:
        spark.streams.addListener(meter.listener())
    except Exception:
        meter = None  # listener unsupported -> no split, bench still runs

    # Warmup: run the flagship at the smallest sf to absorb JVM startup,
    # and one tiny mapInPandas so the Python daemon + worker pool and
    # their numpy/pandas imports exist before any plan is timed (the
    # r9 fold put the codec-execute plans mid-suite, where a cold
    # Python spawn showed up as a phantom 3x on the first of them).
    registry["flagship_window_metrics"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()
    from sp500_stock_etl_spark.operators.multimodal import synthetic_png_corpus

    synthetic_png_corpus(spark, 2).write.format("noop").mode(
        "overwrite"
    ).save()

    # The quadratic exhibit is benched at sf0.01 (see module docstring);
    # everything else at the bench sf.
    exhibit_sf_override = {"dedup_ngram_jaccard": "/root/testdata/sf0.01"}

    def run_once(name: str) -> tuple[float, dict | None]:
        q = registry[name]
        d = exhibit_sf_override.get(name, sf_dir)
        if meter is not None:
            meter.reset()
        t0 = time.perf_counter()
        q.spark_fn(spark, d).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        # Data-wall/scheduling-wall split for plans that ran streaming
        # queries. The zero-snapshot fast path skips the bounded drain
        # for pure-batch plans (no listener events ever fire), so the
        # split costs the suite nothing outside streaming plans; the
        # drain itself runs OUTSIDE the timed window.
        stream = None
        if meter is not None and (
            name.startswith("streaming_") or meter._snap() != (0, 0, 0, 0)
        ):
            s = meter.drain()
            if s["queries"] or s["batches"]:
                s["sched_wall_s"] = round(max(wall - s["exec_s"], 0.0), 3)
                stream = s
        return wall, stream

    # Tail policy (module docstring): core always runs; the non-core
    # tail runs whole by default, or in deterministic halves when
    # SPARK_GRAFT_BENCH_TAIL=rotate (sorted-name parity vs the round
    # count read off the committed BENCH_r*.json files).
    core_set = set(CORE_QUERIES)
    tail_mode = os.environ.get("SPARK_GRAFT_BENCH_TAIL", "all")
    tail_names = sorted(
        n
        for n in BENCH_QUERIES
        if n not in core_set and n not in EXHIBIT_QUERIES
    )
    if tail_mode == "rotate":
        import glob as _glob

        rnd = len(
            _glob.glob(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "BENCH_r*.json",
                )
            )
        )
        tail_names = [n for i, n in enumerate(tail_names) if i % 2 == rnd % 2]
    to_run = [
        n
        for n in BENCH_QUERIES
        if n in core_set or n in EXHIBIT_QUERIES or n in set(tail_names)
    ]

    # Recommended plans are timed best-of-2 (the host carries background
    # load; min-of-N is the standard steady-state estimator). Exhibits
    # run once — they are contrast baselines, not the headline.
    timings: dict[str, float] = {}
    exhibit_timings: dict[str, float] = {}
    stream_split: dict[str, dict] = {}
    for name in to_run:
        wall, s = run_once(name)
        if name in EXHIBIT_QUERIES:
            exhibit_timings[name] = wall
        else:
            timings[name] = wall
            if s is not None:
                stream_split[name] = s
    for name in list(timings):
        wall, s = run_once(name)
        _fold_best_of(timings, stream_split, name, wall, s)

    new_timings: dict[str, float] = {}
    for name in NEW_QUERIES:
        if name in registry:
            wall, s = run_once(name)
            new_timings[name] = wall
            if s is not None:
                stream_split[name] = s
    for name in list(new_timings):
        wall, s = run_once(name)
        _fold_best_of(new_timings, stream_split, name, wall, s)

    core_value = round(sum(timings[n] for n in CORE_QUERIES if n in timings), 3)
    full_suite = round(sum(timings.values()), 3)
    value_new = round(sum(new_timings.values()), 3)
    # full_value is single-scale: only exhibits timed at the bench sf
    # are added; scale-overridden exhibits report in the detail file.
    full = round(
        full_suite
        + sum(
            t
            for n, t in exhibit_timings.items()
            if n not in exhibit_sf_override
        ),
        3,
    )

    host_st_ms = _host_fingerprint_ms()
    host_mt_ms = _host_parallel_fingerprint_ms()
    # Suite-level streaming split (only plans in the suite's kept
    # best-of run count): the full-suite anchor ratio decomposes as
    # (batch walls + stream exec) + stream scheduling-wall; the last
    # term is scheduler jitter, not plan cost.
    in_suite = {n: s for n, s in stream_split.items() if n in timings}
    stream_sched_wall_s = round(
        sum(s["sched_wall_s"] for s in in_suite.values()), 3
    )
    stream_exec_s = round(sum(s["exec_s"] for s in in_suite.values()), 3)
    # Core line's OWN scheduler share (r13 verdict item 2): the r13
    # driver artifact breached its core band top purely on host state
    # (st 1.43x slow; streaming micro-batch scheduling is driver-
    # single-thread-bound), but the core line carried no term to show
    # it. Stamp the core's scheduler share and its data wall so a
    # band breach is attributable from the compact line alone; band
    # judgment is data-wall-based (BASELINE.md §7).
    core_sched_wall_s = round(
        sum(s["sched_wall_s"] for n, s in in_suite.items() if n in core_set),
        3,
    )
    core_data_wall_s = round(core_value - core_sched_wall_s, 3)
    detail = {
        "host_st_ms": host_st_ms,
        "host_mt_ms": host_mt_ms,
        "queries": timings,
        "queries_new": new_timings,
        "streaming_split": stream_split,
        "stream_sched_wall_s": stream_sched_wall_s,
        "stream_exec_s": stream_exec_s,
        "core_sched_wall_s": core_sched_wall_s,
        "core_data_wall_s": core_data_wall_s,
        "core_queries": CORE_QUERIES,
        "core_key_map": {_short_key(n): n for n in CORE_QUERIES},
        "exhibits": exhibit_timings,
        "exhibit_sf": {
            n: exhibit_sf_override.get(n, sf_dir).rsplit("sf", 1)[-1]
            for n in exhibit_timings
        },
        "value": core_value,
        "value_full_suite": full_suite,
        "value_new": value_new,
        "full_value": full,
        "tail_mode": tail_mode,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    # ONE compact final line — must survive the driver's 2000-char
    # tail capture (round-5 verdict item 5). r15 change (r14 verdict
    # item 1): ``queries`` now carries the 55 per-CORE-query seconds
    # (3 significant digits) IN ADDITION to the section counts, so the
    # driver's PERF per_query/geomean/scaling blocks compute over real
    # timings instead of comparing counts to counts. The anchor
    # history that used to live in the metric string (r12 new-host
    # anchors: core 105.389s band 80.3-109.5, full suite 353.368s over
    # the 168-plan union) moved to BASELINE.md §7 + this docstring to
    # make room; methodology, timed set and scale are UNCHANGED.
    print(
        _compact_line(
            {
                "metric": "55-plan core wall-clock (noop sink; "
                "anchors BASELINE.md §7; data-wall judging via "
                "*_sched_wall_s; core_key_map in detail)",
                "value": core_value,
                "unit": "sec",
                "queries": {
                    "n_core": sum(1 for n in CORE_QUERIES if n in timings),
                    "n_recommended": len(timings),
                    "n_new": len(new_timings),
                    "n_exhibits": len(exhibit_timings),
                },
                "_core_timings": {
                    n: timings[n] for n in CORE_QUERIES if n in timings
                },
                "value_full_suite": full_suite,
                "value_new": value_new,
                "full_value": full,
                "stream_sched_wall_s": stream_sched_wall_s,
                "stream_exec_s": stream_exec_s,
                "core_sched_wall_s": core_sched_wall_s,
                "core_data_wall_s": core_data_wall_s,
                "tail_mode": tail_mode,
                "detail": "BENCH_DETAIL.json",
                "host_st_ms": host_st_ms,
                "host_mt_ms": host_mt_ms,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            },
            CORE_QUERIES,
        )
    )


if __name__ == "__main__":
    main()
