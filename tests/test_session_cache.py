"""persist_scoped semantics: warm reuse on identical plans, eviction only on
plan change, eager release. Guards the r3 regression where every call evicted
the previous generation and repeat runs (bench min-of-N) recomputed the full
lineage cold."""

from __future__ import annotations

from pyspark.sql import functions as F

from pinterest_data_pipeline_spark import session as S


def _frame(spark, n):
    return spark.range(n).withColumn("x", F.col("id") * 2)


def test_identical_plan_reuses_cached_generation(spark):
    a = S.persist_scoped(_frame(spark, 10), "t_reuse")
    assert a.is_cached
    b = S.persist_scoped(_frame(spark, 10), "t_reuse")
    assert b is a, "canonically identical plan must return the live cache"
    assert a.is_cached
    S.release_scoped("t_reuse")


def test_changed_plan_evicts_previous_generation(spark):
    a = S.persist_scoped(_frame(spark, 10), "t_evict")
    c = S.persist_scoped(_frame(spark, 20), "t_evict")
    assert c is not a
    assert not a.is_cached, "previous generation must be unpersisted"
    assert c.is_cached
    S.release_scoped("t_evict")
    assert not c.is_cached


def test_release_all_scopes(spark):
    a = S.persist_scoped(_frame(spark, 5), "t_all_1")
    b = S.persist_scoped(_frame(spark, 6), "t_all_2")
    S.release_scoped()
    assert not a.is_cached and not b.is_cached
