#!/usr/bin/env python
"""Regenerate PLANS.md: the committed `.explain("formatted")` audit of
the headline queries, with a per-plan checklist of the physical
properties that matter at 100 TB — filter pushdown reached the scan,
projection pruned the read schema, small dims broadcast, no cartesian
products, no row-at-a-time Python, whole-stage codegen engaged.

Usage: python scripts/plan_audit.py   (writes PLANS.md at repo root)
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

# The plans a reviewer should read: one per operator family, ordered
# roughly by how much the physical strategy matters.
AUDITED = [
    "flagship_window_metrics",
    "filtered_scan_projection",
    "grouped_agg_pricing",
    "broadcast_star_join",
    "fact_fact_join",
    "star_chain_q5",
    "asof_join_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_prefix_jaccard",
    "dq_violation_counts",
    "similarity_lsh_topk",
    "similarity_ivf_topk_nprobe2",
    "dedup_embedding_cosine",
    "similarity_join_corpus",
    "weighted_avg_pricing_decimal",
    "corpus_curation_pipeline",
    "tpch_q6_forecast_revenue",
    "tpch_q11_important_parts",
    "tpch_q13_custdist",
    "tpch_q19_disjunctive_join",
    "corpus_balanced_sample",
    "corpus_mix_sample",
    "gap_fill_forward",
    "corpus_chunking",
    "corpus_boilerplate_segments",
    "corpus_sequence_packing",
    "scd2_event_history",
    "sma_crossover_signals",
    "max_drawdown_per_symbol",
    "feature_outlier_fences",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_supplier",
    "embedding_quantize_int8",
    "token_heavy_hitters_sketch",
    "event_funnel_conversion",
    "cohort_retention_weekly",
    # round 5
    "tpch_q9_profit",
    "tpch_q12_shipmode",
    "corpus_decontamination_bloom",
    "text_repetition_stats",
    "corpus_unigram_stats",
    "corpus_boilerplate_rewrite",
    "bucketed_fact_join",
    "corpus_tfidf_topterms",
    "dedup_semantic_clusters",
    "xml_roundtrip_agg",
    "corpus_reservoir_sample",
    "corpus_train_val_test_split",
    "triangle_count_basket",
    "entity_resolution_customers",
    "schema_evolution_scan",
    "dedup_connected_components_star",
    "zorder_layout_stats",
    "asof_join_tolerance",
    "asof_join_forward",
    # round 6
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
    "corpus_lm_quality_score",
    "jsonl_sink_roundtrip_agg",
    "corpus_curation_v2",
    "dedup_keep_best_quality",
    # round 7
    "embedding_pq_encode_init",
    "dedup_incremental_refresh",
    "tpcds_q67_rollup_topk",
    "tpcds_q51_cumulative_max",
    "corpus_doc_embedding_hybrid_dedup",
    "dedup_exact_substring",
    "kmeans_assign_init",
    "corpus_bpe_encode",
    "tpcds_q97_channel_overlap",
    "incremental_agg_maintenance",
    "multimodal_resize_plan",
    # round 8
    "multimodal_resize_execute",
    "multimodal_pcm_chunk_execute",
    "multimodal_decode_features",
    "tpcds_q38_channel_intersect",
    "tpcds_q87_channel_except",
    "tpcds_q14_cross_channel_items",
    "token_heavy_hitters_sketch",
    "approx_monitoring_profile",
    "streaming_running_totals_final",
    "multimodal_jpeg_decode_execute",
    "multimodal_mjpeg_frame_decode",
    "quality_classifier_inference",
    "corpus_domain_mixture",
    "unpivot_measures_long",
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
    "indicator_bollinger_bands",
    "indicator_rsi_cutler",
    "indicator_ewma_fold",
    "indicator_max_drawdown",
    "tpcds_q51_cumulative_crossover",
    "tpcds_q57_monthly_deviation",
    "indicator_advance_decline",
    "indicator_market_beta",
    "indicator_sma_backtest",
    "indicator_portfolio_var",
    "indicator_cusum_changepoint",
    "indicator_risk_report",
    # round 9/10 births
    "arrow_udtf_installments",
    "streaming_cdc_upsert_bucketed",
    "streaming_cdc_upsert_sharded",
]


def _checklist(plan: str) -> list[str]:
    notes = []
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    real_pushed = [p for p in pushed if p.strip()]
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if pushed:
        notes.append(
            f"- pushdown: {len(real_pushed)}/{len(pushed)} scans carry PushedFilters"
        )
    elif schemas:
        notes.append(
            "- pushdown: no scan-level predicates in this query (nothing to push)"
        )
    else:
        notes.append(
            "- pushdown: no file scans in this plan (generated/derived input)"
        )
    if schemas:
        widths = [len(s.split(",")) for s in schemas]
        notes.append(
            f"- pruning: scan schema width(s) {widths} columns (vs full table width)"
        )
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    if n_bhj or n_smj:
        notes.append(f"- joins: {n_bhj} broadcast-hash, {n_smj} sort-merge")
    assert "CartesianProduct" not in plan or "similarity_bruteforce" in plan, (
        "cartesian product leaked into an audited plan"
    )
    if "BatchEvalPython" in plan:
        notes.append("- WARNING: row-at-a-time Python in plan")
    if "ArrowEvalPython" in plan or "MapInPandas" in plan:
        notes.append("- python: Arrow-batched only (no row-at-a-time)")
    # Codegen ids only appear once AQE finalizes the plan, so they are
    # under-reported in a pre-execution explain; the `*` prefix on node
    # names marks codegen-capable spans even pre-AQE.
    n_wsc = len(re.findall(r"^\s*[+:\-| ]*\* ", plan, re.M))
    if n_wsc == 0 and "AdaptiveSparkPlan" in plan:
        notes.append(
            "- codegen: plan under AQE — codegen regions materialize at runtime"
        )
    else:
        notes.append(
            f"- codegen: {n_wsc} codegen-capable operator(s) (pre-AQE view)"
        )
    n_ex = plan.count("Exchange")
    reused = plan.count("ReusedExchange")
    notes.append(f"- shuffles: {n_ex} Exchange nodes ({reused} reused)")
    return notes


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    out = [
        "# PLANS — physical plan audit (generated by scripts/plan_audit.py)",
        "",
        f"`explain('formatted')` for the headline queries at `{sf_dir}`.",
        "Checklist per plan: filters pushed to the scan, read schema",
        "pruned, small dims broadcast, no cartesian products, Python",
        "only Arrow-batched, whole-stage codegen engaged. Note: plans",
        "are pre-AQE (AQE re-plans exchanges at runtime — coalescing",
        "shuffle partitions and switching skewed SMJs to broadcast).",
        "",
    ]
    for name in AUDITED:
        df = registry[name].spark_fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        out.append(f"## {name}")
        out.append("")
        out.extend(_checklist(plan))
        out.append("")
        out.append("```")
        # The operator tree (before the verbose per-node detail) is the
        # readable part; keep detail sections out of the committed file.
        tree = plan.split("\n\n")[0]
        out.append(tree.rstrip())
        out.append("```")
        out.append("")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(AUDITED)} plans)")


if __name__ == "__main__":
    main()
