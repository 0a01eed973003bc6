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
# ROUND-12 ROTATION (tool-proposed): the two r12 births take the first
# seats (never-certified invariant); the 39 r11-certified births take
# their second-certification seats; the 9 remaining seats go to the
# r9-certified cohort longest owed a second row. Zero back-fill — every
# seat pays certification debt; the EXPECTED_QUEUE (43 once-certified
# entries) drains in r13 per the owed-seconds math in NOTES.md
# (VERDICT r11 item 1).
SEATING_ROUND = 12  # invariant tests evaluate the ledger as of SEATING_ROUND-1

PRIORITY_WINDOW: tuple[str, ...] = (
    "quality_bigram_logloss",  # birth
    "dedup_longest_shared_ngram",  # birth
    "text_phrase_search",  # r11
    "events_bitmap_retention",  # r11
    "events_max_concurrency_daily",  # r11
    "agg_gini_customer_revenue",  # r11
    "events_funnel_latency",  # r11
    "text_pmi_cooccurrence",  # r11
    "events_top_paths",  # r11
    "text_ngram_novelty",  # r11
    "dedup_sorted_neighborhood",  # r11
    "events_cuped_adjusted",  # r11
    "events_theilsen_trend",  # r11
    "events_kaplan_meier",  # r11
    "streaming_bitmap_distinct",  # r11
    "events_rolling_wau_bitmap",  # r11
    "sample_systematic",  # r11
    "dedup_weighted_jaccard_adjacent",  # r11
    "text_char_entropy",  # r11
    "sample_group_split_no_leakage",  # r11
    "events_markov_accuracy",  # r11
    "text_readability",  # r11
    "agg_hierarchical_share",  # r11
    "events_decay_score_dyadic",  # r11
    "quality_duplicate_payments",  # r11
    "text_zipf_slope",  # r11
    "events_entry_channel_conversion",  # r11
    "quality_join_key_skew",  # r11
    "events_new_vs_returning",  # r11
    "quality_functional_dependency",  # r11
    "quality_langid_confusion",  # r11
    "pipeline_corpus_card",  # r11
    "quality_k_anonymity",  # r11
    "quality_simpsons_reversal",  # r11
    "search_ndcg_bm25",  # r11
    "quality_split_contamination",  # r11
    "dedup_linkage_fs_weights",  # r11
    "dedup_lsh_param_planner",  # r11
    "join_spatial_grid_neighbors",  # r11
    "quality_embedding_proximity_audit",  # r11
    "ml_kmeans_separation",  # r11
    "sketch_tdigest_quantile_bounds",  # r9
    "agg_tdigest_grouped_p95",  # r9
    "ann_ivf_pq_recall_sweep",  # r9
    "events_rolling_p95_tdigest",  # r9
    "dedup_jaccard_prefix_join",  # r9
    "dedup_winnow_shared_fingerprints",  # r9
    "streaming_tdigest_daily_p95",  # r9
    "clean_impute_median_by_group",  # r9
    "events_rolling_wau_kmv",  # r9
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
