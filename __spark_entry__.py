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
# ROUND-9 ROTATION (tool-proposed): the 13 round-8 births and the six
# r8 EXPECTED_QUEUE members take the owed seats; the round-9 births are
# seated at birth; the remaining seats back-fill with the STALEST
# twice-certified queries (last certified r1-r4) for re-verification.
SEATING_ROUND = 9  # invariant tests evaluate the ledger as of SEATING_ROUND-1

PRIORITY_WINDOW: tuple[str, ...] = (
    # round-9 additions, seated at birth (never certified yet)
    "sketch_tdigest_quantile_bounds",
    "agg_tdigest_grouped_p95",
    "ann_ivf_pq_recall_sweep",
    "sample_weighted_multi_draw",
    # late-r9 additions, seated at birth
    "events_rolling_p95_tdigest",
    "sample_token_budget_mix",
    "events_rolling_wau_kmv",
    "clean_impute_median_by_group",
    "streaming_tdigest_daily_p95",
    "dedup_jaccard_prefix_join",
    "dedup_winnow_shared_fingerprints",
    "scd2_asof_segments",
    "agg_weighted_median_price",
    # round-8 births — second row
    "join_bloom_prefilter",
    "sketch_kmv_distinct_union",
    "dedup_prefix_clusters",
    "cdc_apply_changelog",
    "events_user_streaks",
    "quality_drift_psi",
    "streaming_session_window",
    "ann_ivf_pq_topk",
    "anomaly_mad_events",
    "text_boilerplate_ngrams",
    "agg_mode_deterministic",
    "events_rolling_active_users",
    "join_asof_tolerance",
    # r8 EXPECTED_QUEUE (once-certified r7) — second row
    "sample_reservoir_topk",
    "text_utf8_bytes_arrow",
    "join_null_safe_keys",
    "ann_lsh_topk",
    "events_transition_matrix",
    "sketch_cms_part_counts",
    # stalest twice-certified back-fill (ledger order: last cert round)
    "q2_orders_per_brand_year",
    "q3_top_supplier_per_nation",
    "q4_nation_with_top_supplier",
    "q5_top_segment_per_balance_band",
    "q6_median_acctbal_per_band",
    "q7_orders_per_year",
    "q8_median_price_by_year",
    "q9_median_price_by_year_priority",
    "clean_age_group_customers",
    "clean_scalar_functions",
    "set_ops_customers",
    "join_semi_customers_with_orders",
    "join_outer_order_counts",
    "agg_rollup_region_nation",
    "agg_stats_suite",
    "explode_document_tokens",
    "json_extract_event_props",
    "events_daily_rollup",
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
