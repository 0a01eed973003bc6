#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the flagship queries.

Evidence artifact for plan review — shows pushdown, pruning, broadcast,
WindowGroupLimit, partial aggregation, and exchange placement per query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pinterest_data_pipeline_spark.plans import analytics, extensions, relational  # noqa: F401
from pinterest_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.01"

FLAGSHIPS = [
    "q1_top_brand_per_nation",
    "q6_median_acctbal_per_band",
    "join_asof_latest_order",
    "events_session_window",
    "dedup_exact_documents",
    "dedup_minhash_near_duplicates",
    "dedup_simhash_near_duplicates",
    "top_k_orders",
    "tpch_q5_local_supplier_volume",
    "subquery_correlated_above_nation_avg",
    "merge_upsert_orders",
    "events_view_purchase_attribution",
    "events_resample_ffill",
    # round-2 additions
    "window_analytics_battery",
    "tpch_q6_forecast_revenue",
    "tpch_q17_small_quantity_revenue",
    "tpch_q21_waiting_suppliers",
    "multimodal_image_features",
    # round-5/6 additions
    "pack_sequences_documents",
    "tfidf_top_terms",
    "dedup_cluster_canonical",
    "events_sessionize_gap",
    "embedding_quantize_int8",
    "ann_two_stage_rerank",
    "text_unigram_logprob",
    "join_salted_skewed",
    "quality_column_profile",
    # round-7 additions
    "events_funnel_steps",
    "events_retention_cohorts",
    "join_dpp_partition_pruned",
    "cdc_snapshot_diff",
    "sketch_mg_heavy_langs",
    "embedding_truncate_renormalize",
    "dedup_containment_adjacent",
    # late-r7 additions
    "sample_weighted_by_length",
    "sketch_cms_part_counts",
    "ann_pq_topk",
    "join_lateral_top_customers",
    "recursive_order_chain",
    "events_ewma_daily",
    "text_utf8_bytes_arrow",
    "join_null_safe_keys",
    "ann_binary_hamming_topk",
    "events_pattern_match",
    "events_transition_matrix",
    # round-8 additions
    "join_bloom_prefilter",
    "sketch_kmv_distinct_union",
    "dedup_prefix_clusters",
    "cdc_apply_changelog",
    "events_user_streaks",
    "quality_drift_psi",
    "ann_ivf_pq_topk",
    "anomaly_mad_events",
    "text_boilerplate_ngrams",
    "agg_mode_deterministic",
    "events_rolling_active_users",
    "join_asof_tolerance",
    # round-9 additions
    "sketch_tdigest_quantile_bounds",
    "agg_tdigest_grouped_p95",
    "ann_ivf_pq_recall_sweep",
    "sample_weighted_multi_draw",
    "events_rolling_p95_tdigest",
    "sample_token_budget_mix",
    "events_rolling_wau_kmv",
    "clean_impute_median_by_group",
    "dedup_jaccard_prefix_join",
    "dedup_winnow_shared_fingerprints",
    "scd2_asof_segments",
    "agg_weighted_median_price",
    # round-10 additions
    "sketch_tdigest_weighted_median",
    "ann_ivf_filtered_topk",
    "cdc_scd2_roundtrip",
    "sketch_kmv_set_overlap",
    "text_sparse_cosine_pairs",
    "events_market_basket_pairs",
    "embedding_jl_projection",
    "window_global_percent_rank",
    "join_fuzzy_deletion_neighbors",
    "scd2_temporal_fact_join",
    "agg_pareto_skyline",
    "graph_triangle_count",
    "events_attribution_multi_touch",
    "text_bm25_topk",
    "search_hybrid_rrf",
    "graph_pagerank",
    "agg_equidepth_bins",
    "join_interval_bucketed",
    "ml_kmeans_quantized",
    "events_ab_chisquare",
    "quality_ks_two_sample",
    "clean_winsorized_mean",
    "events_seasonal_mase",
    "graph_bfs_hops",
    "events_cumulative_users",
    "events_market_basket_triples",
    "anomaly_cusum_daily",
    "sample_proportional_quota",
    "agg_revenue_concentration",
    "orc_roundtrip_battery",
    "anomaly_bot_regularity",
    "quality_knn_label_agreement",
    "sample_negative_pairs",
    "text_rake_keywords",
    "join_fifo_allocation",
    "quality_cohens_kappa",
    "window_clamped_running_balance",
    "agg_rfm_segments",
    "quality_spearman_corr",
    "quality_benford_digits",
    "stat_bootstrap_ci_mean",
    "events_daily_trend_slope",
    "events_autocorrelation_lag",
    "quality_mann_whitney_u",
    "window_rolling_median_daily",
    "graph_label_propagation",
    "ml_target_encode_kfold",
    "events_time_weighted_avg",
    "events_sessionize_capped",
    "text_phrase_search",
    # streaming_tdigest_daily_p95 is excluded: its plan embeds a completed
    # streaming drive's table read, not a reviewable static plan
    # round-10 session-5 additions
    "events_bitmap_retention",
    "events_max_concurrency_daily",
    "agg_gini_customer_revenue",
    "events_funnel_latency",
    "text_pmi_cooccurrence",
    "events_top_paths",
    "text_ngram_novelty",
    "dedup_sorted_neighborhood",
    "events_cuped_adjusted",
    "events_theilsen_trend",
    "events_kaplan_meier",
    "events_rolling_wau_bitmap",
    "sample_systematic",
    "dedup_weighted_jaccard_adjacent",
    "text_char_entropy",
    "sample_group_split_no_leakage",
    "events_markov_accuracy",
    "text_readability",
    "agg_hierarchical_share",
    "events_decay_score_dyadic",
    "quality_duplicate_payments",
    "text_zipf_slope",
    "events_entry_channel_conversion",
    "quality_join_key_skew",
    "events_new_vs_returning",
    "quality_functional_dependency",
    "quality_langid_confusion",
    "pipeline_corpus_card",
    # streaming_bitmap_distinct is excluded like the other streaming
    # drives: its plan embeds a completed run's table read
    # session-6 births
    "quality_k_anonymity",
    "quality_simpsons_reversal",
    "search_ndcg_bm25",
    "quality_split_contamination",
    "dedup_linkage_fs_weights",
    "dedup_lsh_param_planner",
    "join_spatial_grid_neighbors",
    "quality_embedding_proximity_audit",
    "ml_kmeans_separation",
    # round-12 births
    "quality_bigram_logloss",
    "dedup_longest_shared_ngram",
    # round-13 births
    "quality_kendall_tau",
    "quality_js_divergence_sources",
    "events_diff_in_differences",
    "sample_temperature_mix_weights",
    "agg_pearson_matrix",
    # round-14 births (the incremental-store family)
    "dedup_incremental_batch",
    "ann_ivf_incremental_upsert",
    "dedup_incremental_clusters",
    "sketch_incremental_kmv",
    # round-15 births (index lifecycle + sketch-store refresh; the
    # promoted simhash certification keeps its original FLAGSHIPS slot)
    "ann_ivf_index_compaction",
    "sketch_incremental_tdigest",
    "embedding_store_drift",
    "dedup_incremental_batch_pruned",
    "sketch_incremental_mg",
    "ann_rerank_label_boost",
    # round-16 births (retrain migration + streaming arrival paths +
    # bucket-store compaction)
    "ann_ivf_centroid_retrain",
    "dedup_incremental_stream_store",
    "dedup_bucket_store_compaction",
    "ann_ivf_stream_upsert",
    "sketch_kmv_stream_store",
    "ann_ivf_drift_gated_retrain",
]


def main() -> None:
    spark = get_spark("plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = [
        "# PLANS — formatted physical plans of flagship queries",
        "",
        f"Generated by `python tools/dump_plans.py` at sf dir `{SF}`.",
        "Regenerate after any plan-affecting change.",
        "",
    ]
    for name in FLAGSHIPS:
        df = analytics.QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(mode)
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(FLAGSHIPS)} plans)")


if __name__ == "__main__":
    main()
