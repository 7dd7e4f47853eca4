"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query end-to-end (materialized via the `noop` sink
— full execution, no driver-side collect overhead) and prints ONE
JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Usage: python bench.py            # sf0.1 by default
       SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

#: Headline set: the reference-parity core (scan/filter/agg/topk), the
#: relational extension (broadcast + shuffle joins, windows), and the
#: pipeline operators (dedup, ANN, text, events).
HEADLINE = [
    "tpch_q1",
    "tpch_q5",
    "tpch_q18",
    "filter_eq_project",
    "agg_group_minmax",
    "limit_topk",
    "join_broadcast_dims",
    "join_shuffle_revenue",
    "window_topk_per_group",
    "agg_count_distinct",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "ann_bruteforce_topk",
    "text_quality",
    "text_fingerprint",
    "events_tumbling_window",
    "events_sessionize",
    "events_retention",
    "ann_ivf_topk",
    "pipeline_curate",
    # subquery/decorrelation suite + hypertable rollup
    "tpch_q4",
    "tpch_q13",
    "tpch_q17",
    "events_rollup_granularity",
    "tpch_q7",
    "tpch_q8",
    # round 2: semantic clustering + curation additions
    "corpus_kmeans",
    "corpus_semdedup",
    "corpus_repetition",
    "corpus_dedup_keep_best",
    "corpus_pq_topk",
    "corpus_curate_full",
    "data_quality_checks",
    "corpus_lm_score",
    "data_cdc_upsert",
    # round 2 cont.: time-series, sub-document dedup, hybrid retrieval
    "events_gap_fill",
    "corpus_span_dedup",
    "ann_hybrid_search",
    "events_downsample_ohlc",
    "data_incremental_rollup",
    "data_skew_report",
    "events_anomaly_zscore",
    "variant_props_rollup",
    "text_bm25_search",
    "multimodal_ppm_roundtrip",
    "corpus_sketch_quantiles",
    "events_cohort_retention",
    "events_time_weighted_avg",
    "events_heartbeat_gaps",
    "customer_rfm_segments",
    "sample_weighted",
    "basket_association_rules",
    "data_snapshot_diff",
    # round 3: training-set assembly additions
    "corpus_chunk_sliding",
    "corpus_ngram_topk",
    "ann_batch_topk",
    "text_pii_redact",
    "corpus_dsir_select",
    "corpus_winnow_fingerprint",
    "ann_ivf_pq_topk",
    "join_bloom_prefilter",
    "corpus_bpe_train",
    "corpus_eval_split",
    "corpus_dup_span_removal",
    "ann_recall_eval",
    "data_zorder_layout",
    "corpus_sketch_cms",
    "pipeline_pretraining_full",
    "corpus_ivf_occupancy",
    "multimodal_wav_roundtrip",
    "multimodal_frame_sample",
    # round 3b: warehouse history, graph, multimodal dedup, tokenization
    "data_scd2_history",
    "events_markov_transitions",
    "corpus_quality_classifier",
    "corpus_contrastive_pairs",
    "sample_reservoir_group",
    "multimodal_image_dedup",
    "text_readability",
    "events_attribution_last_touch",
    "data_gdpr_cascade_delete",
    "corpus_bpe_tokenize",
    "graph_triangle_count",
    "data_scd2_pointintime",
    "corpus_curriculum_order",
    "pipeline_rag_index",
    # round 3c: analytics, hygiene, semantics batteries
    "ann_filtered_topk",
    "events_user_features",
    "multimodal_audio_vad",
    "vec_quality_checks",
    "events_ab_test_analysis",
    "events_rolling_wau",
    "text_ngram_novelty",
    "corpus_topic_keywords",
    "data_skipping_audit",
    "data_dp_noisy_counts",
    "scalar_bitwise_funcs",
    "scalar_try_arith",
    "join_null_safe_eq",
    "window_gaps_islands",
    # round 3 final: composites, audits, BI batteries
    "corpus_knn_classify",
    "multimodal_scene_cuts",
    "corpus_ccnet_buckets",
    "corpus_chunk_dedup",
    "events_path_topk",
    "events_wow_change",
    "events_hourly_seasonality",
    "events_time_to_convert",
    "text_langid_confusion",
    "data_column_profile",
    "sql_text_q6",
    "data_bloom_fpr_audit",
    "dedup_bloom_incremental",
    "corpus_pq_recall_eval",
    # round 3 close: quality gates, BI reports, forensics
    "text_entropy_filter",
    "customer_pareto_report",
    "events_new_vs_returning",
    "vec_int8_quantize_audit",
    "orders_lead_time_sla",
    "agg_digit_histogram",
    "corpus_dataset_card",
    "supplier_concentration_hhi",
    "text_zipf_fit",
    "dedup_cluster_purity",
    # round 4: trained PQ, cross-polytope blocking, star components
    "corpus_pq_trained_recall",
    "dedup_embedding_cosine",
    "dedup_embedding_scaled",
    "dedup_cluster_components",
    "corpus_pq_codebook_audit",
    "ann_cp_topk",
    "dedup_cp_band_balance",
    # graph_components_deep_chain stays out of the headline: it is a
    # convergence-depth stress (~18 s at sf0.1, driver-latency bound
    # across ~15 star rounds), not a throughput workload — registered
    # and oracle-checked, measured in SCALING.md instead
    "vec_matryoshka_audit",
    # round 5
    "vec_pca_project",
    "corpus_pack_sequences",
    "data_shard_balance",
    "udtf_run_length",
    "corpus_kmeanspp_init",
    "dedup_fuzzy_typenames",
    "data_kanonymity_audit",
    "vec_pca_variance",
    "events_cusum_drift",
    "events_trend_slope",
    "data_ldiversity_audit",
    "corpus_pack_utilization",
    "ann_ndcg_eval",
    "pipeline_dedup_cascade",
    "corpus_preference_pairs",
    "events_snaive_backtest",
    "graph_kcore_peel",
    "corpus_span_corruption",
    "text_source_kl_divergence",
    "data_export_manifest",
    "events_anomaly_mad",
    "graph_degree_powerlaw",
    "corpus_sft_loss_mask",
    "text_langid_calibration",
    "corpus_epoch_plan",
    "corpus_neyman_allocation",
    "text_heaps_law",
    "vec_whitening_audit",
    "data_sketch_time_rollup",
    "corpus_domain_mixture",
    "linkage_sorted_neighborhood",
    "graph_link_prediction",
    "label_agreement_kappa",
    "data_cv_folds",
    "data_benford_audit",
    "text_source_jsd",
    "corpus_quantile_normalize",
    "linkage_fellegi_sunter",
    "stats_poisson_bootstrap",
    "events_theil_sen_trend",
    "stats_ks_drift",
    "events_changepoint_detect",
    "graph_linkpred_eval",
    "stats_psi_drift",
    "stats_auc_mannwhitney",
    "stats_chi2_drift",
    "events_acf_lags",
    "events_item_cooccurrence",
    "stats_spearman_daily",
    "events_holt_backtest",
    "stats_kendall_tau",
    "agg_kmv_jaccard",
    "join_cardinality_sketch",
    "graph_ppr_seeds",
    "graph_hits_bipartite",
    "data_group_split_audit",
    "events_attribution_multitouch",
    "pipeline_entity_resolution",
    "data_compaction_plan",
    "stats_winsorized_mean",
    "join_lateral_topk",
    "corpus_perceptron_probe",
    "events_survival_km",
    "stats_logrank_cohorts",
    "stats_cuped_adjusted",
    "stats_srm_check",
    "stats_power_mde",
    "stats_jackknife_ratio",
    "stats_msprt_sequential",
    "events_policy_replay",
    "stats_qini_uplift",
    "ann_hard_negatives",
    "graph_assortativity",
    "events_seasonal_decompose",
    "data_target_encoding",
    "stats_ols_elasticity",
    "corpus_unigram_prune",
    "data_freshness_audit",
    # round 6: complete coverage — every registered query priced
    # (except graph_components_deep_chain, which stays out per the
    # documented convergence-depth exclusion above)
    "agg_approx_distinct",
    "agg_approx_distinct_error",
    "agg_argmax",
    "agg_array_collect",
    "agg_cube",
    "agg_filter_clause",
    "agg_global",
    "agg_grouping_sets",
    "agg_histogram",
    "agg_percentiles",
    "agg_pivot",
    "agg_rollup",
    "agg_stats",
    "ann_centroid_margin_audit",
    "ann_lsh_multiprobe_topk",
    "ann_lsh_topk",
    "ann_range_search",
    "arithmetic_exprs",
    "cast_types",
    "corpus_bpe_fertility",
    "corpus_cluster_cohesion",
    "corpus_contamination",
    "corpus_dedup_eval",
    "corpus_graph_pagerank",
    "corpus_ivf_learned",
    "corpus_length_gate",
    "corpus_mixture_plan",
    "corpus_multimodal_features",
    "corpus_multimodal_resize",
    "corpus_normalize_dedup",
    "corpus_quality_funnel_report",
    "corpus_sketch_merge",
    "corpus_source_balance_gini",
    "corpus_source_mix",
    "corpus_temperature_sample",
    "corpus_token_packing",
    "corpus_vocab_coverage",
    "customer_interpurchase_time",
    "data_late_arriving_facts",
    "dedup_bag_jaccard",
    "dedup_chain_recursive",
    "dedup_containment",
    "dedup_incremental",
    "dedup_ngram_prefix",
    "dedup_simhash",
    "dedup_source_attribution",
    "dedup_threshold_sweep",
    "distinct_dedup_rows",
    "events_bounce_rate",
    "events_burstiness",
    "events_dwell_time",
    "events_funnel",
    "events_mix_drift",
    "events_seasonal_anomaly",
    "events_sliding_window",
    "events_type_affinity",
    "events_type_stats",
    "events_weekend_effect",
    "explode_tokens",
    "filter_boolean_ops",
    "filter_neq_in_between",
    "join_anti",
    "join_asof_clicks",
    "join_cross_count",
    "join_full_outer",
    "join_left_outer",
    "join_range_bands",
    "join_salted_skew",
    "join_semi",
    "json_extract_props",
    "multimodal_metadata",
    "orders_backlog_aging",
    "orders_quarterly_yoy",
    "part_price_integrity",
    "part_supply_geography",
    "project_literals",
    "region_revenue_rollup",
    "reshape_unpivot",
    "sample_deterministic",
    "sample_stratified",
    "scalar_array_funcs",
    "scalar_case_when",
    "scalar_date_funcs",
    "scalar_map_funcs",
    "scalar_math_funcs",
    "scalar_null_funcs",
    "scalar_regexp_funcs",
    "scalar_string_funcs",
    "scan_project",
    "set_except",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union",
    "set_union_all",
    "sort_multi_key",
    "subquery_exists",
    "subquery_scalar",
    "text_langid",
    "text_lexical_diversity",
    "text_rolling_hash",
    "text_tfidf",
    "text_token_counts",
    "text_word_length_profile",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q19",
    "tpch_q2",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "tpch_q6",
    "tpch_q9",
    "udaf_grouped_pandas",
    "udf_pandas_sigmoid",
    "udtf_bigrams",
    "udtf_polymorphic_onehot",
    "vec_covariance_matrix",
    "vec_doc_referential_audit",
    "vec_label_balance",
    "vec_text_alignment_audit",
    "window_first_last",
    "window_lag_lead",
    "window_moving_avg",
    "window_ntile_cume",
    "window_range_frame",
    "window_rank_dense",
    "window_running_sum",
    "window_topk_with_ties",
    # round 10: the priced high-recall MinHash point (r9 verdict
    # task 8) — benched next to dedup_minhash so the 34-vs-4 band
    # candidate-volume cost stays a measured number
    "dedup_minhash_highrecall",
    # round 11: the DOULION-sampled scale tier next to the exact
    # triangle count (r10 verdict task 1) — the exact/sampled cost
    # ratio stays a measured number every round
    "graph_triangle_sampled",
]

#: The r1-subset total of the round-8 committed record — the canonical
#: ambient reference point (the box's fastest same-tree measurement of
#: the untouched-since-r1 canary set). ``canary_factor`` in every bench
#: record is r1_subset_total / this, so round-over-round comparisons
#: and the close-gate's 1.5 s heavyweight threshold scale with the
#: box's ambient instead of flipping on a slow driver day (r9 verdict
#: tasks 1-2).
R1_CANARY_BASE = 14.16

#: The 27 queries benched in round 1 — reported as a separate subtotal
#: each round so round-over-round deltas aren't confounded by headline
#: set growth (the full-set total grows every round by construction).
R1_SUBSET = [
    "tpch_q1", "tpch_q5", "tpch_q18", "filter_eq_project",
    "agg_group_minmax", "limit_topk", "join_broadcast_dims",
    "join_shuffle_revenue", "window_topk_per_group", "agg_count_distinct",
    "dedup_exact", "dedup_minhash", "dedup_ngram_jaccard",
    "ann_bruteforce_topk", "text_quality", "text_fingerprint",
    "events_tumbling_window", "events_sessionize", "events_retention",
    "ann_ivf_topk", "pipeline_curate", "tpch_q4", "tpch_q13", "tpch_q17",
    "events_rollup_granularity", "tpch_q7", "tpch_q8",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from spark_query_engine import queries as registry
    from spark_query_engine.session import get_session

    spark = get_session("bench")

    qs = registry.queries()

    # JVM/codegen warmup: cheap full pipeline once
    qs["limit_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    reruns: dict[str, float] = {}
    for name in HEADLINE:
        # run 1 = warmup (whole-stage-codegen compile + JIT of this
        # query's generated classes — one-time cost, heavily load-
        # sensitive); runs 2-3 = recorded, keep the MIN. A single
        # recorded run occasionally absorbed a GC/compaction stall
        # (observed 2.8 s -> 14.4 s on the same query and data), and
        # the per-round number is one shot — min-of-2 measures the
        # query, not the stall.
        runs: list[float] = []
        for i in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            if i > 0:
                runs.append(time.time() - t0)
            # isolate queries: drop persisted intermediates (dedup
            # shingle caches etc.) so cache residue can't tax the next
            spark.catalog.clearCache()
        # r12 (r11 verdict task 1): if the two recorded runs spread
        # more than 2x, one of them absorbed an ambient stall — take
        # ONE extra recorded run so the kept min measures the query,
        # not the box. Bounded (at most one re-run per query), and the
        # kept statistic is still the min over recorded runs.
        if max(runs) > 2.0 * min(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
            reruns[name] = round(runs[-1], 3)
        timings[name] = round(min(runs), 3)
        all_runs[name] = [round(r, 3) for r in runs]

    total = round(sum(timings.values()), 3)
    # Dispersion, made visible (round-5 verdict task 5): the same tree
    # measured 217.9 s (builder) vs 236.3 s (driver) on this shared
    # box — ±~8% ambient. Recording BOTH post-warmup runs per query
    # makes round-over-round drift vs noise decidable from the
    # committed artifact alone: if run pairs straddle the delta, it's
    # ambient; if both runs moved together, it's the code.
    spread = round(
        sum(max(r) - min(r) for r in all_runs.values()), 3
    )
    # Canary normalization (r9 verdict task 2): the committed record
    # carries the ambient factor and per-query canary-adjusted values
    # so bench_diff and the close gate adjudicate regressions at
    # ×(canary-adjusted) mechanically, without manual ambient prose.
    r1_total = round(sum(timings[n] for n in R1_SUBSET if n in timings), 3)
    canary_factor = round(r1_total / R1_CANARY_BASE, 4) if r1_total else 1.0
    # r12 (r11 verdict task 1): the in-loop canary measures the box at
    # the START of the session (the r1 subset runs first in HEADLINE
    # order). Re-time the same 27 queries once each at the END so the
    # record can self-certify that the ambient held for the whole run
    # — r11's record was taken on a box that degraded 3.3x mid-session
    # and was only adjudicable by forensics. Single timed run per
    # query (codegen is warm; the min-of-2 discipline guards the kept
    # per-query numbers, this leg only needs the ambient sum).
    end_canary: dict[str, float] = {}
    for name in R1_SUBSET:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        end_canary[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    r1_end_total = round(sum(end_canary.values()), 3)
    canary_factor_end = round(r1_end_total / R1_CANARY_BASE, 4)
    canary_drift = (
        round(abs(canary_factor_end - canary_factor) / canary_factor, 4)
        if canary_factor
        else 0.0
    )
    ambient_flags: list[str] = []
    if canary_factor > 1.35:
        ambient_flags.append(
            f"start canary {canary_factor} > 1.35: box degraded at start"
        )
    if canary_factor_end > 1.35:
        ambient_flags.append(
            f"end canary {canary_factor_end} > 1.35: box degraded at end"
        )
    if canary_drift > 0.15:
        ambient_flags.append(
            f"canary drifted {canary_drift:.0%} within the run: ambient unstable"
        )
    ambient_ok = not ambient_flags
    if not ambient_ok:
        print(
            "bench: AMBIENT-DEGRADED RECORD — " + "; ".join(ambient_flags),
            file=sys.stderr,
        )
    record = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": all_runs,
        "run_spread_total": spread,
        "r1_subset_total": r1_total,
        "canary_base": R1_CANARY_BASE,
        "canary_factor": canary_factor,
        "r1_subset_end_total": r1_end_total,
        "canary_factor_end": canary_factor_end,
        "canary_drift": canary_drift,
        "ambient_ok": ambient_ok,
        "ambient_flags": ambient_flags,
        "end_canary_runs": end_canary,
        "reruns": reruns,
        "adjusted": {
            n: round(t / canary_factor, 3) for n, t in timings.items()
        },
        "adjusted_total": round(total / canary_factor, 3),
        # round-over-round comparables: HEADLINE is append-only, so
        # each round's full set is a prefix of the next round's
        "r2_subset_total": round(
            sum(timings[n] for n in HEADLINE[:54] if n in timings), 3
        ),
        "r3_subset_total": round(
            sum(timings[n] for n in HEADLINE[:124] if n in timings), 3
        ),
        "r5_subset_total": round(
            sum(timings[n] for n in HEADLINE[:210] if n in timings), 3
        ),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(record))
    # The driver's BENCH_r{N}.json capture keeps only the stdout TAIL
    # (round 3 lost 61 of 124 per-query rows) — persist the full
    # record to a committed repo file so every round stays diffable
    # per-query against the previous one.
    (Path(__file__).resolve().parent / "BENCH_FULL.json").write_text(
        json.dumps(record, indent=1) + "\n"
    )
    # LAST line = a compact self-contained summary (r7 verdict task 9):
    # the driver's tail window starts mid-way into the ~20 KB full
    # record, leaving BENCH_r{N}.json with parsed=null. The final
    # stdout line always survives a tail capture intact, so emit the
    # headline numbers + top-10 there; the full per-query artifact is
    # the committed BENCH_FULL.json.
    top10 = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "r1_subset_total": record["r1_subset_total"],
                "canary_factor": canary_factor,
                "canary_factor_end": canary_factor_end,
                "canary_drift": canary_drift,
                "ambient_ok": ambient_ok,
                "adjusted_total": record["adjusted_total"],
                "run_spread_total": spread,
                "queries": top10,
                "queries_are": "top10 by time; all in BENCH_FULL.json",
                "sf": record["sf"],
                "full_record": "BENCH_FULL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
