#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Execution is measured with the noop sink (full plan runs, no
driver-side result transfer). A small warmup query absorbs JVM/codegen
startup so per-query numbers reflect steady-state execution; the
recommended plans are timed best-of-2 to damp background-load noise on
the shared host.

The headline ``value`` covers the RECOMMENDED plans only. Three
queries are deliberate EXHIBITS — correctness baselines whose plans
are documented scale-killers, kept so the bucketed/declarative
variants have something to be measured against:

- grouped_map_value_diff: Arrow applyInPandas recomputing what
  flagship_window_metrics does declaratively (the "UDFs are the
  escape hatch" exhibit);
- similarity_bruteforce_topk: broadcast x crossJoin full-corpus scan
  (baseline for similarity_lsh_topk / similarity_ivf_topk);
- dedup_ngram_jaccard: exact all-pairs baseline, quadratic past the
  max-df cap (baseline for dedup_minhash_lsh / dedup_simhash; the
  engineered exact path is dedup_prefix_jaccard — measured against it
  in BASELINE.md §4, kept out of this suite so the headline stays
  comparable round-over-round).

They are timed and reported under ``exhibits`` with a combined
``full_value``, but excluded from the headline number.

Round-4 change (round-2 verdict item 6): the ngram exhibit runs at
sf0.01 — its argument is the RATIO vs the bucketed/prefix plans at a
common scale, not an absolute at the bench sf, and at sf0.1 its 27 s
dominated ``full_value`` while saying nothing new. The JSON records
the sf each exhibit ran at so the numbers are never cross-read.

Round-5 changes (round-4 verdict item 9 + advice):
- the round-4 additions are FOLDED INTO the recommended set — one
  fixed 47-plan headline from here on. Round-over-round anchor: r4
  measured the same 47 plans as 24.652 s (28-plan headline) +
  17.594 s (queries_r4) = 42.246 s total (recorded in BASELINE.md).
- ``full_value`` now sums only plans measured at the bench sf;
  scale-overridden exhibits report under ``exhibits`` exclusively, so
  the field is single-scale and diffable across rounds.
- this round's new queries report under ``queries_r5`` (same
  separate-section methodology r4 used) until the next fold.
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

# Round-5 additions, reported under a SEPARATE key so the headline
# `value` stays comparable round-over-round (the driver diffs
# overlapping queries; these get their own sum until the next fold).
R5_QUERIES = [
    "tpch_q9_profit",
    "tpch_q12_shipmode",
    "streaming_ohlc_bars_append",
    "text_repetition_stats",
    "corpus_decontamination_bloom",
    "corpus_unigram_stats",
    # --- mid-round-5 additions ---
    "corpus_boilerplate_rewrite",
    "bucketed_fact_join",
    "streaming_stream_stream_left_join",
    "corpus_tfidf_topterms",
    "dedup_semantic_clusters",
    "dedup_prefix_jaccard",  # promoted: carries the r5 pushdown-blowup fix
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
]

# One per operator family (BASELINE.md bench set). Fixed 47-plan
# recommended suite since round 5: the original 28-plan set plus the
# round-4 additions, folded per round-4 verdict item 9 (r4 anchor for
# the widened set: 24.652 + 17.594 = 42.246 s, BASELINE.md §2).
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
    # --- round-4 additions, folded into the headline in round 5 ---
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("sp500-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # Warmup: run the flagship at the smallest sf to absorb JVM startup.
    registry["flagship_window_metrics"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()

    # The quadratic exhibit is benched at sf0.01 (see module docstring);
    # everything else at the bench sf.
    exhibit_sf_override = {"dedup_ngram_jaccard": "/root/testdata/sf0.01"}

    def run_once(name: str) -> float:
        q = registry[name]
        d = exhibit_sf_override.get(name, sf_dir)
        t0 = time.perf_counter()
        q.spark_fn(spark, d).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # Recommended plans are timed best-of-2 (the host carries background
    # load; min-of-N is the standard steady-state estimator and the
    # second pass costs ~30 s). Exhibits run once — they are contrast
    # baselines, not the headline.
    timings: dict[str, float] = {}
    exhibit_timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name in EXHIBIT_QUERIES:
            exhibit_timings[name] = run_once(name)
        else:
            timings[name] = run_once(name)
    for name in timings:
        timings[name] = min(timings[name], run_once(name))

    r5_timings: dict[str, float] = {}
    for name in R5_QUERIES:
        r5_timings[name] = run_once(name)
    for name in r5_timings:
        r5_timings[name] = min(r5_timings[name], run_once(name))

    recommended = round(sum(timings.values()), 3)
    # full_value is single-scale (round-4 advice): only exhibits timed
    # at the bench sf are added; scale-overridden exhibits report
    # under `exhibits`/`exhibit_sf` exclusively.
    full = round(
        recommended
        + sum(
            t
            for n, t in exhibit_timings.items()
            if n not in exhibit_sf_override
        ),
        3,
    )
    print(
        json.dumps(
            {
                "metric": "recommended-plan suite wall-clock "
                "(noop sink; baseline exhibits excluded; 47-plan set "
                "since r5, r4 anchor 42.246 s)",
                "value": recommended,
                "unit": "sec",
                "queries": timings,
                "queries_r5": r5_timings,
                "value_r5": round(sum(r5_timings.values()), 3),
                "exhibits": exhibit_timings,
                "exhibit_sf": {
                    n: exhibit_sf_override.get(n, sf_dir).rsplit("sf", 1)[-1]
                    for n in exhibit_timings
                },
                "full_value": full,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
