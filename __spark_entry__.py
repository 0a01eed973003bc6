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
# ROUND-16 ROTATION (tool-proposed): the seven r15 births are
# once-certified and keep seats; the three r16 births seat at birth;
# the four r14 births (certified r14+r15) keep seats one more round as
# the youngest twice-certified block; back-fill continues through the
# stalest r4/r5-r5/r6 block.
SEATING_ROUND = 16  # invariant tests evaluate the ledger as of SEATING_ROUND-1

PRIORITY_WINDOW: tuple[str, ...] = (
    "ann_ivf_centroid_retrain",  # birth
    "dedup_incremental_stream_store",  # birth
    "dedup_bucket_store_compaction",  # birth
    "ann_ivf_stream_upsert",  # birth
    "sketch_kmv_stream_store",  # birth
    "ann_ivf_drift_gated_retrain",  # birth
    "dedup_simhash_near_duplicates",  # r15
    "ann_ivf_index_compaction",  # r15
    "sketch_incremental_tdigest",  # r15
    "embedding_store_drift",  # r15
    "dedup_incremental_batch_pruned",  # r15
    "sketch_incremental_mg",  # r15
    "ann_rerank_label_boost",  # r15
    "events_resample_interpolate",  # r5,r6
    "window_time_range_frame",  # r5,r6
    "join_bucketed_colocated",  # r5,r6
    "clean_normalize_nulls_documents",  # r1,r7
    "clean_parse_human_count_part",  # r1,r7
    "clean_strip_prefix_part",  # r1,r7
    "clean_distinct_flag_status",  # r1,r7
    "window_running_revenue",  # r1,r7
    "join_anti_customers_without_orders",  # r1,r7
    "text_token_stats",  # r1,r7
    "text_lang_id",  # r1,r7
    "text_quality_scores",  # r1,r7
    "text_fingerprints",  # r1,r7
    "dedup_ngram_jaccard_adjacent",  # r1,r7
    "sample_stratified_by_lang",  # r6,r7
    "ann_ivf_topk",  # r6,r7
    "streaming_upsert_latest_events",  # r6,r7
    "streaming_incremental_rollup",  # r6,r7
    "csv_roundtrip_malformed",  # r6,r7
    "sketch_hll_distinct_parts",  # r6,r7
    "tpch_q12_priority_shipmode",  # r6,r7
    "tpch_q14_promo_revenue_share",  # r5,r7
    "tpch_q19_disjunctive_predicates",  # r5,r7
    "tpch_q6_forecast_revenue",  # r5,r7
    "join_salted_skewed",  # r6,r7
    "events_sessionize_gap",  # r6,r7
    "join_asof_next_order",  # r6,r8
    "agg_approx_distinct",  # r6,r8
    "q6_median_acctbal_per_band_approx",  # r6,r8
    "dedup_containment_adjacent",  # r7,r8
    "sample_weighted_by_length",  # r7,r8
    "text_ngram_vocab_topk",  # r7,r8
    "ann_lsh_multitable_topk",  # r7,r8
    "ann_pq_topk",  # r7,r8
    "ann_binary_hamming_topk",  # r7,r8
    "text_pii_redaction",  # r6,r8
    "text_repetition_battery",  # r6,r8
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
