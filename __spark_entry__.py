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
# ROUND-13 ROTATION (tool-proposed): the 5 r13 births take the first
# seats (never-certified invariant) and the 45-entry owed-seconds
# backlog (2 r12 births + the 43-strong once-certified queue) fills the
# rest EXACTLY — zero back-fill, zero queue. After r13 certifies, every
# oracled query in the registry is at least twice driver-certified
# (VERDICT r12 item 1).
SEATING_ROUND = 13  # invariant tests evaluate the ledger as of SEATING_ROUND-1

PRIORITY_WINDOW: tuple[str, ...] = (
    "quality_kendall_tau",  # birth
    "quality_js_divergence_sources",  # birth
    "events_diff_in_differences",  # birth
    "sample_temperature_mix_weights",  # birth
    "agg_pearson_matrix",  # birth
    "quality_bigram_logloss",  # r12
    "dedup_longest_shared_ngram",  # r12
    "sample_token_budget_mix",  # r9
    "sample_weighted_multi_draw",  # r9
    "graph_triangle_count",  # r10
    "events_attribution_multi_touch",  # r10
    "text_bm25_topk",  # r10
    "search_hybrid_rrf",  # r10
    "graph_pagerank",  # r10
    "agg_equidepth_bins",  # r10
    "join_interval_bucketed",  # r10
    "ml_kmeans_quantized",  # r10
    "events_ab_chisquare",  # r10
    "quality_ks_two_sample",  # r10
    "clean_winsorized_mean",  # r10
    "events_seasonal_mase",  # r10
    "graph_bfs_hops",  # r10
    "events_cumulative_users",  # r10
    "events_market_basket_triples",  # r10
    "anomaly_cusum_daily",  # r10
    "sample_proportional_quota",  # r10
    "agg_revenue_concentration",  # r10
    "orc_roundtrip_battery",  # r10
    "anomaly_bot_regularity",  # r10
    "quality_knn_label_agreement",  # r10
    "sample_negative_pairs",  # r10
    "text_rake_keywords",  # r10
    "join_fifo_allocation",  # r10
    "quality_cohens_kappa",  # r10
    "window_clamped_running_balance",  # r10
    "agg_rfm_segments",  # r10
    "quality_spearman_corr",  # r10
    "quality_benford_digits",  # r10
    "stat_bootstrap_ci_mean",  # r10
    "events_daily_trend_slope",  # r10
    "events_autocorrelation_lag",  # r10
    "quality_mann_whitney_u",  # r10
    "window_rolling_median_daily",  # r10
    "graph_label_propagation",  # r10
    "ml_target_encode_kfold",  # r10
    "events_time_weighted_avg",  # r10
    "events_sessionize_capped",  # r10
    "agg_weighted_median_price",  # r9
    "scd2_asof_segments",  # r9
    "agg_pareto_skyline",  # r10
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
