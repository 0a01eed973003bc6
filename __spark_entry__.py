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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(analytics.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL dual for each oracle-checkable query."""
    return dict(oracles.ORACLES)
