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
# ROUND-15 ROTATION (tool-proposed): maintenance mode continues — the
# four r14 births are the only once-certified (owed-seconds) entries and
# take the first seats; r15 births seat at birth as they land; the
# remaining back-fill goes to the STALEST twice-certified queries (the
# r5/r6-certified block VERDICT r14 item 2 named).
SEATING_ROUND = 15  # invariant tests evaluate the ledger as of SEATING_ROUND-1

PRIORITY_WINDOW: tuple[str, ...] = (
    "dedup_simhash_near_duplicates",  # birth
    "ann_ivf_index_compaction",  # birth
    "sketch_incremental_tdigest",  # birth
    "embedding_store_drift",  # birth
    "dedup_incremental_batch_pruned",  # birth
    "sketch_incremental_mg",  # birth
    "ann_rerank_label_boost",  # birth
    "dedup_incremental_batch",  # r14
    "ann_ivf_incremental_upsert",  # r14
    "dedup_incremental_clusters",  # r14
    "sketch_incremental_kmv",  # r14
    "subquery_exists_urgent_customers",  # r4,r5
    "subquery_in_heavy_parts",  # r4,r5
    "subquery_scalar_above_avg_price",  # r4,r5
    "scalar_date_functions",  # r4,r5
    "scalar_string_functions",  # r4,r5
    "tpch_q3_shipping_priority",  # r4,r5
    "events_view_purchase_attribution",  # r4,r5
    "json_variant_extract_props",  # r4,r5
    "json_variant_grouped_stats",  # r4,r5
    "events_resample_ffill",  # r4,r5
    "anomaly_zscore_events",  # r4,r5
    "quality_referential_integrity",  # r4,r5
    "array_hof_battery",  # r4,r5
    "tpch_q18_large_orders",  # r4,r5
    "tpch_q9_product_type_profit",  # r4,r5
    "tpch_q21_waiting_suppliers",  # r4,r5
    "tpch_q2_min_cost_supplier",  # r4,r5
    "sample_hash_split_counts",  # r5,r6
    "sample_hash_split_membership",  # r5,r6
    "sample_per_lang_cap",  # r5,r6
    "ann_topk_cosine",  # r5,r6
    "text_normalization_collapse",  # r5,r6
    "text_normalized_keys",  # r5,r6
    "pack_sequences_documents",  # r5,r6
    "text_chunk_sliding",  # r5,r6
    "tfidf_top_terms",  # r5,r6
    "multimodal_video_frames",  # r5,r6
    "dedup_cluster_canonical",  # r5,r6
    "tpch_q10_returned_items",  # r5,r6
    "tpch_q4_order_priority",  # r5,r6
    "tpch_q7_volume_shipping",  # r5,r6
    "tpch_q8_market_share",  # r5,r6
    "tpch_q13_customer_distribution",  # r5,r6
    "tpch_q15_top_supplier",  # r5,r6
    "tpch_q16_supplier_part_counts",  # r5,r6
    "tpch_q17_small_quantity_revenue",  # r5,r6
    "tpch_q20_promotion_suppliers",  # r5,r6
    "tpch_q22_dormant_customers",  # r5,r6
    "tpch_q11_important_stock",  # r5,r6
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
