"""Pin the curated driver window (VERDICT r1 item 2/7).

The correctness driver evaluates only the first 50 ``queries()`` entries, so
the registry prefix is the repo's hard correctness signal. These tests keep
the window honest as queries are added: exactly 50 curated entries, every one
oracle-checked, and every operator family represented — a new query can never
silently push a family out of the driver's view.
"""

from __future__ import annotations

import __spark_entry__ as entry
from pinterest_data_pipeline_spark.plans import oracles

DRIVER_WINDOW = 50

# One (or more) required representative per operator family. A family is
# "in the window" iff at least one of its members sits in the first 50.
# Round-4 rotation: twice-certified members made room for never-certified
# oracled siblings, so several families are now represented by a rotated-in
# sibling (e.g. join variants by the TPC-H semi/anti + outer shapes,
# set ops by INTERSECT, quality by the FK-integrity check).
FAMILY_REPRESENTATIVES: dict[str, tuple[str, ...]] = {
    "reference_battery": ("q1_top_brand_per_nation",),
    "events_time": ("events_tumbling_window", "events_session_window"),
    "asof_join": ("join_asof_latest_order",),
    "sql_bridge_set_ops": ("set_ops_customers", "set_ops_intersect"),
    "cleaning": ("clean_part_battery", "clean_normalize_nulls_documents"),
    "window_functions": ("window_analytics_battery", "window_order_sequence"),
    # semi/anti are certified by tpch_q21's EXISTS/NOT EXISTS -> semi/anti
    # hash joins; left-outer by tpch_q18/q21 and the asof join
    "join_variants": (
        "join_semi_customers_with_orders",
        "join_outer_order_counts",
        "tpch_q21_waiting_suppliers",
    ),
    "applyinpandas_grouped_map": ("events_user_value_trend",),
    "range_join": ("join_range_ship_window",),
    "fuzzy_join": ("join_fuzzy_part_names",),
    "grouping_analytics": (
        "agg_rollup_region_nation",
        "agg_grouping_sets",
        "agg_cube_flag_status",
    ),
    "pivot": ("agg_pivot_status_revenue",),
    "stats_agg": ("agg_stats_suite", "agg_count_distinct"),
    "skew_salting": ("agg_salted_returnflag",),
    "explode_reshape": (
        "explode_document_tokens",
        "reshape_unpivot_part_sizes",
        "array_hof_battery",
    ),
    # the availableNow round-trip certifies S4-S8 + T2/T3 with a driver row
    "streaming_surface": ("streaming_availablenow_events",),
    "top_k": ("top_k_orders",),
    "scalar_suites": (
        "scalar_date_functions",
        "scalar_string_functions",
        "scalar_map_functions",
    ),
    "variant_json": ("json_variant_extract_props", "json_variant_grouped_stats"),
    "text_analysis": ("text_analysis_battery",),
    "bpe_tokenization": ("text_bpe_token_counts",),
    "multimodal": ("multimodal_image_features", "multimodal_audio_features"),
    # normalization + hash split are hash-checked inside the curation
    # pipeline's composition oracle
    "text_normalization": ("text_normalized_keys", "pipeline_curate_documents"),
    "udtf": ("text_sentence_split_udtf",),
    "dedup_exact": ("dedup_exact_documents",),
    "dedup_near": ("dedup_minhash_near_duplicates", "dedup_ngram_jaccard_adjacent"),
    "dedup_simhash": ("dedup_simhash_near_duplicates_stable",),
    "near_dup_clustering": ("dedup_near_duplicate_clusters",),
    "curation_pipeline": ("pipeline_curate_documents",),
    "sampling": ("sample_hash_split_counts", "pipeline_curate_documents"),
    "similarity": ("ann_topk_quantized",),
    # the scale-safe LSH variant took the slot from the quadratic exact one
    "embedding_near_dup": (
        "embedding_near_duplicates",
        "embedding_near_duplicates_exact",
    ),
    "subqueries": (
        "subquery_correlated_above_nation_avg",
        "subquery_exists_urgent_customers",
        "subquery_in_heavy_parts",
        "subquery_scalar_above_avg_price",
    ),
    "merge": ("merge_upsert_orders",),
    "scd2": ("scd2_customer_segments",),
    "quality": ("quality_expectations_orders", "quality_referential_integrity"),
    "tpch": ("tpch_q1_pricing_summary", "tpch_q3_shipping_priority"),
    "json_extract": ("json_extract_event_props", "json_variant_extract_props"),
    "timeseries_extensions": ("events_resample_ffill", "anomaly_zscore_events"),
    "embedding_analytics": ("embedding_label_centroids",),
}


# The round-4 rotation: queries that left the window. Every one was
# driver-certified green (rows+schema+hash) in BOTH CORRECTNESS_r02 and
# CORRECTNESS_r03, so losing the slot costs no unverified surface — their
# parity is still enforced by tools/check_parity.py and this suite. This pin
# stops a future registry edit from silently re-inserting one at the cost of
# a never-certified query's slot.
ROTATED_OUT_R4: frozenset[str] = frozenset(
    {
        "q2_orders_per_brand_year",
        "q3_top_supplier_per_nation",
        "q4_nation_with_top_supplier",
        "q5_top_segment_per_balance_band",
        "q6_median_acctbal_per_band",
        "q7_orders_per_year",
        "q8_median_price_by_year",
        "q9_median_price_by_year_priority",
        "json_extract_event_props",
        "events_daily_rollup",
        "events_tumbling_window",
        "events_sliding_window",
        "set_ops_customers",
        "clean_age_group_customers",
        "clean_scalar_functions",
        "join_semi_customers_with_orders",
        "join_outer_order_counts",
        "agg_rollup_region_nation",
        "agg_stats_suite",
        "explode_document_tokens",
        "multimodal_image_features",
        "embedding_near_duplicates_exact",
        "subquery_correlated_above_nation_avg",
        "quality_expectations_orders",
        "tpch_q1_pricing_summary",
        "tpch_q5_local_supplier_volume",
    }
)


def test_rotated_out_queries_stay_out():
    """Rotated-out (twice-certified) queries must not re-take a slot."""
    window = set(entry.PRIORITY_WINDOW)
    back_in = ROTATED_OUT_R4.intersection(window)
    assert not back_in, (
        f"twice-certified rotated-out queries re-occupying slots: {back_in}"
    )


def test_priority_window_is_exactly_driver_sized():
    assert len(entry.PRIORITY_WINDOW) == DRIVER_WINDOW
    assert len(set(entry.PRIORITY_WINDOW)) == DRIVER_WINDOW


def test_priority_window_leads_registry():
    names = list(entry.queries())
    assert tuple(names[:DRIVER_WINDOW]) == entry.PRIORITY_WINDOW
    # nothing lost: the reorder must keep every registered query
    assert len(names) == len(set(names))


def test_every_windowed_query_is_oracle_checked():
    missing = [n for n in entry.PRIORITY_WINDOW if n not in oracles.ORACLES]
    assert not missing, f"window entries without DuckDB oracle: {missing}"


def test_window_covers_every_operator_family():
    window = set(entry.PRIORITY_WINDOW)
    uncovered = {
        family: reps
        for family, reps in FAMILY_REPRESENTATIVES.items()
        if not window.intersection(reps)
    }
    assert not uncovered, f"families pushed out of the driver window: {uncovered}"
