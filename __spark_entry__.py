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
# ROUND-10 ROTATION (tool-proposed): the 13 round-9 births take the
# owed second-certification seats; round-10 births are seated at birth;
# the remaining seats back-fill with the STALEST twice-certified queries
# (last certified r1-r4) for re-verification.
SEATING_ROUND = 10  # invariant tests evaluate the ledger as of SEATING_ROUND-1

PRIORITY_WINDOW: tuple[str, ...] = (
    "sketch_tdigest_weighted_median",  # birth
    "ann_ivf_filtered_topk",  # birth
    "cdc_scd2_roundtrip",  # birth
    "sketch_kmv_set_overlap",  # birth
    "text_sparse_cosine_pairs",  # birth
    "events_market_basket_pairs",  # birth
    "embedding_jl_projection",  # birth
    "window_global_percent_rank",  # birth
    "streaming_dedup_rollup",  # birth
    "join_fuzzy_deletion_neighbors",  # birth
    "scd2_temporal_fact_join",  # birth
    "agg_pareto_skyline",  # birth
    "graph_triangle_count",  # birth
    "events_attribution_multi_touch",  # birth
    "text_bm25_topk",  # birth
    "search_hybrid_rrf",  # birth
    "graph_pagerank",  # birth
    "agg_equidepth_bins",  # birth
    "join_interval_bucketed",  # birth
    "ml_kmeans_quantized",  # birth
    "events_ab_chisquare",  # birth
    "quality_ks_two_sample",  # birth
    "clean_winsorized_mean",  # birth
    "events_seasonal_mase",  # birth
    "graph_bfs_hops",  # birth
    "events_cumulative_users",  # birth
    "events_market_basket_triples",  # birth
    "anomaly_cusum_daily",  # birth
    "sample_proportional_quota",  # birth
    "agg_revenue_concentration",  # birth
    "orc_roundtrip_battery",  # birth
    "anomaly_bot_regularity",  # birth
    "quality_knn_label_agreement",  # birth
    "sample_negative_pairs",  # birth
    "text_rake_keywords",  # birth
    "join_fifo_allocation",  # birth
    "quality_cohens_kappa",  # birth
    "window_clamped_running_balance",  # birth
    "agg_rfm_segments",  # birth
    "quality_spearman_corr",  # birth
    "quality_benford_digits",  # birth
    "stat_bootstrap_ci_mean",  # birth
    "events_daily_trend_slope",  # birth
    "events_autocorrelation_lag",  # birth
    "quality_mann_whitney_u",  # birth
    "window_rolling_median_daily",  # birth
    "graph_label_propagation",  # birth
    "ml_target_encode_kfold",  # birth
    "events_time_weighted_avg",  # birth
    "events_sessionize_capped",  # birth
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
