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
# ROUND-11 ROTATION (tool-proposed): the 39 session-4/5/6 births that
# overflowed r10's 100%-birth window take their first-certification
# seats; the 11 remaining seats go to the r10-certified births owed
# their second row. Zero back-fill — every seat pays certification debt;
# the zero-never-certified invariant restores when CORRECTNESS_r11.json
# lands (VERDICT r10 item 1).
SEATING_ROUND = 11  # invariant tests evaluate the ledger as of SEATING_ROUND-1

PRIORITY_WINDOW: tuple[str, ...] = (
    "text_phrase_search",  # birth
    "events_bitmap_retention",  # birth
    "events_max_concurrency_daily",  # birth
    "agg_gini_customer_revenue",  # birth
    "events_funnel_latency",  # birth
    "text_pmi_cooccurrence",  # birth
    "events_top_paths",  # birth
    "text_ngram_novelty",  # birth
    "dedup_sorted_neighborhood",  # birth
    "events_cuped_adjusted",  # birth
    "events_theilsen_trend",  # birth
    "events_kaplan_meier",  # birth
    "streaming_bitmap_distinct",  # birth
    "events_rolling_wau_bitmap",  # birth
    "sample_systematic",  # birth
    "dedup_weighted_jaccard_adjacent",  # birth
    "text_char_entropy",  # birth
    "sample_group_split_no_leakage",  # birth
    "events_markov_accuracy",  # birth
    "text_readability",  # birth
    "agg_hierarchical_share",  # birth
    "events_decay_score_dyadic",  # birth
    "quality_duplicate_payments",  # birth
    "text_zipf_slope",  # birth
    "events_entry_channel_conversion",  # birth
    "quality_join_key_skew",  # birth
    "events_new_vs_returning",  # birth
    "quality_functional_dependency",  # birth
    "quality_langid_confusion",  # birth
    "pipeline_corpus_card",  # birth
    "quality_k_anonymity",  # birth
    "quality_simpsons_reversal",  # birth
    "search_ndcg_bm25",  # birth
    "quality_split_contamination",  # birth
    "dedup_linkage_fs_weights",  # birth
    "dedup_lsh_param_planner",  # birth
    "join_spatial_grid_neighbors",  # birth
    "quality_embedding_proximity_audit",  # birth
    "ml_kmeans_separation",  # birth
    "sketch_tdigest_weighted_median",  # r10
    "ann_ivf_filtered_topk",  # r10
    "cdc_scd2_roundtrip",  # r10
    "sketch_kmv_set_overlap",  # r10
    "text_sparse_cosine_pairs",  # r10
    "events_market_basket_pairs",  # r10
    "embedding_jl_projection",  # r10
    "window_global_percent_rank",  # r10
    "streaming_dedup_rollup",  # r10
    "join_fuzzy_deletion_neighbors",  # r10
    "scd2_temporal_fact_join",  # r10
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
