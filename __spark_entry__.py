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


# The correctness driver evaluates the FIRST 50 registry entries. The
# window's composition is DATA-DRIVEN: tools/ledger.py derives each
# query's certification history from CORRECTNESS_r*.json, and
# tests/test_registry_window.py asserts the seating invariants against it
# (every oracled-never-certified query seated; no twice-certified query
# holding a seat while an under-certified one waits; rotation never
# deletes a query — full-registry parity stays enforced locally by
# tools/check_parity.py). Run `python tools/ledger.py` for the ledger,
# and `python tools/ledger.py --propose-window` to GENERATE the rotation
# below (VERDICT r8 item 7 — this window is that tool's output).
# ROUND-14 ROTATION (tool-proposed): maintenance mode begins — after the
# r13 drain every oracled query is at least twice driver-certified, so
# the four r14 births (dedup_incremental_batch, ann_ivf_incremental_upsert,
# dedup_incremental_clusters, sketch_incremental_kmv — seated at birth) and the 5 r13 births (the only owed-seconds entries)
# take the first seats and the remaining back-fill goes to the STALEST
# twice-certified queries (last certified r3/r4/r5). From r14 on, births
# compete with staleness back-fill, not a drain schedule.
SEATING_ROUND = 14  # invariant tests evaluate the ledger as of SEATING_ROUND-1

PRIORITY_WINDOW: tuple[str, ...] = (
    "dedup_incremental_batch",  # birth
    "ann_ivf_incremental_upsert",  # birth
    "dedup_incremental_clusters",  # birth
    "sketch_incremental_kmv",  # birth
    "quality_kendall_tau",  # r13
    "quality_js_divergence_sources",  # r13
    "events_diff_in_differences",  # r13
    "sample_temperature_mix_weights",  # r13
    "agg_pearson_matrix",  # r13
    "events_tumbling_window",  # r2,r3
    "events_sliding_window",  # r2,r3
    "reshape_unpivot_part_sizes",  # r1,r2,r3
    "embedding_near_duplicates_exact",  # r2,r3
    "multimodal_image_features",  # r2,r3
    "subquery_correlated_above_nation_avg",  # r2,r3
    "tpch_q1_pricing_summary",  # r2,r3
    "tpch_q5_local_supplier_volume",  # r2,r3
    "quality_expectations_orders",  # r2,r3
    "q1_top_brand_per_nation",  # r1,r2,r3,r4
    "clean_part_battery",  # r2,r3,r4
    "window_order_sequence",  # r1,r4
    "window_analytics_battery",  # r2,r3,r4
    "set_ops_intersect",  # r1,r4
    "agg_cube_flag_status",  # r1,r4
    "agg_pivot_status_revenue",  # r1,r2,r3,r4
    "agg_count_distinct",  # r1,r4
    "events_session_window",  # r2,r3,r4
    "join_asof_latest_order",  # r2,r3,r4
    "join_range_ship_window",  # r1,r2,r3,r4
    "agg_grouping_sets",  # r2,r3,r4
    "agg_salted_returnflag",  # r1,r2,r3,r4
    "scalar_map_functions",  # r1,r4
    "top_k_orders",  # r1,r2,r3,r4
    "text_analysis_battery",  # r2,r3,r4
    "text_bpe_token_counts",  # r2,r3,r4
    "dedup_exact_documents",  # r1,r2,r3,r4
    "dedup_minhash_near_duplicates",  # r2,r3,r4
    "dedup_simhash_near_duplicates_stable",  # r2,r3,r4
    "dedup_near_duplicate_clusters",  # r2,r3,r4
    "ann_topk_quantized",  # r2,r3,r4
    "text_sentence_split_udtf",  # r2,r3,r4
    "pipeline_curate_documents",  # r2,r3,r4
    "events_user_value_trend",  # r2,r3,r4
    "merge_upsert_orders",  # r2,r3,r4
    "scd2_customer_segments",  # r2,r3,r4
    "join_fuzzy_part_names",  # r2,r3,r4
    "embedding_near_duplicates",  # r4,r5
    "multimodal_audio_features",  # r4,r5
    "embedding_label_centroids",  # r4,r5
    "streaming_availablenow_events",  # r4,r5
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
