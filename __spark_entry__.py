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
# ROUND-4 ROTATION (VERDICT r3 items 1+2): queries certified green in BOTH
# r2 and r3 rotate out (their oracles + tools/check_parity.py coverage
# remain) to give driver rows to the 25 oracled queries that never had one:
# the extended TPC-H shapes, the subquery EXISTS/IN/scalar forms, VARIANT,
# date/string/map scalar suites, cube, exact distinct counts, and the
# scale-safe LSH embedding near-dup (swapped in for the quadratic
# *_exact variant, which keeps its oracle after the window as the
# truth-set generator it should be).
PRIORITY_WINDOW: tuple[str, ...] = (
    # family keeps — one twice-certified representative per operator family
    "q1_top_brand_per_nation",
    "events_session_window",
    "join_asof_latest_order",
    "agg_grouping_sets",
    "events_user_value_trend",
    "clean_part_battery",
    "window_analytics_battery",
    "join_range_ship_window",
    "join_fuzzy_part_names",
    "agg_pivot_status_revenue",
    "agg_salted_returnflag",
    "top_k_orders",
    "text_analysis_battery",
    "text_bpe_token_counts",
    "text_sentence_split_udtf",
    "dedup_exact_documents",
    "dedup_minhash_near_duplicates",
    "dedup_simhash_near_duplicates_stable",
    "dedup_near_duplicate_clusters",
    "pipeline_curate_documents",
    "ann_topk_quantized",
    "merge_upsert_orders",
    "scd2_customer_segments",
    # rotations in — never-certified oracled queries
    "streaming_availablenow_events",
    "embedding_near_duplicates",
    "window_order_sequence",
    "set_ops_intersect",
    "agg_cube_flag_status",
    "agg_count_distinct",
    "scalar_map_functions",
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
    "tpch_q11_important_stock",
    "tpch_q3_shipping_priority",
    "tpch_q9_product_type_profit",
    "tpch_q18_large_orders",
    "tpch_q21_waiting_suppliers",
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
