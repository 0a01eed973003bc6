"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``pinterest_data_pipeline_spark``; this module is a
thin registry so the driver imports one flat surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pinterest_data_pipeline_spark.plans import analytics
from pinterest_data_pipeline_spark.plans import extensions  # noqa: F401  (registers queries)
from pinterest_data_pipeline_spark.plans import relational  # noqa: F401  (registers queries)
from pinterest_data_pipeline_spark.plans import oracles

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Exercises the engine's whole hot path: parquet scan -> 4-way join
    (broadcast dim + sort-merge fact) -> hash aggregate -> window rank ->
    rank=1 filter -> order (SURVEY.md §7 step 1).
    """
    return analytics.q1_top_brand_per_nation(spark, SMOKE_SF_DIR)


# The correctness driver evaluates the FIRST 50 registry entries, so the
# window below is curated: one oracle-checked representative per operator
# family (reference battery, events/streaming-time, joins, aggregates,
# window functions, cleaning, set ops, text analysis, dedup, sampling, ANN,
# subqueries, MERGE/SCD2, quality, TPC-H). Fused "battery" queries
# (clean_part_battery, text_analysis_battery) certify several operators per
# slot; their single-operator forms remain registered after the window for
# focused debugging. tests/test_registry_window.py pins this invariant.
# ROUND-5 ROTATION: every query certified green in two driver rounds
# rotates out (oracle + tools/check_parity.py coverage retained); the 21
# r4-certified keeps stay to earn their second certification; the 20
# oracled queries that never held a driver row (the rest of the TPC-H
# battery, the sampling splits, cosine top-k, text normalization) rotate
# in; and the 8 new round-5 operators (sequence packing, sliding chunks,
# TF-IDF, video frames, cluster-canonical selection, interpolating
# resample, time-range window frames, bucketed co-located join) take the
# remaining slots.
PRIORITY_WINDOW: tuple[str, ...] = (
    # r4-certified keeps - earn their second driver certification
    "streaming_availablenow_events",
    "embedding_near_duplicates",
    "scalar_date_functions",
    "scalar_string_functions",
    "subquery_exists_urgent_customers",
    "subquery_in_heavy_parts",
    "subquery_scalar_above_avg_price",
    "json_variant_extract_props",
    "json_variant_grouped_stats",
    "events_view_purchase_attribution",
    "events_resample_ffill",
    "anomaly_zscore_events",
    "quality_referential_integrity",
    "array_hof_battery",
    "embedding_label_centroids",
    "multimodal_audio_features",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q9_product_type_profit",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
    # fixed this round (r4's one red row - the missing persist_scoped import)
    "tpch_q11_important_stock",
    # rotations in - never-certified oracled queries
    "sample_hash_split_counts",
    "sample_hash_split_membership",
    "sample_per_lang_cap",
    "ann_topk_cosine",
    "text_normalization_collapse",
    "text_normalized_keys",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q12_priority_shipmode",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_predicates",
    "tpch_q20_promotion_suppliers",
    "tpch_q22_dormant_customers",
    # new round-5 operators
    "pack_sequences_documents",
    "text_chunk_sliding",
    "tfidf_top_terms",
    "multimodal_video_frames",
    "dedup_cluster_canonical",
    "events_resample_interpolate",
    "window_time_range_frame",
    "join_bucketed_colocated",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver-checked prefix (PRIORITY_WINDOW) spans every
    operator family; the remaining registry follows in registration order.
    """
    registry = dict(analytics.QUERIES)
    ordered = {name: registry[name] for name in PRIORITY_WINDOW}
    for name, fn in registry.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL dual for each oracle-checkable query."""
    return dict(oracles.ORACLES)
