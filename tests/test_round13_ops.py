"""Round-13 operator tests: the self-enforcing broadcast guard on the
two-phase ranking helpers (VERDICT r12 item 3) — the bucket-offset
frame is counted before the phase-3 join, and above
``BROADCAST_BUCKET_LIMIT`` the join degrades to sort-merge instead of
trusting the caller's domain-boundedness contract forever.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pinterest_data_pipeline_spark.operators import ranking
from pinterest_data_pipeline_spark.operators.ranking import (
    two_phase_rank,
    two_phase_running,
)


def _rank_rows(df, bucket):
    out = two_phase_rank(df, bucket, ["v", "id"], rank_col="r")
    return {r["id"]: r["r"] for r in out.collect()}


def _expected_rank(rows):
    ordered = sorted(rows, key=lambda t: (t[1], t[0]))
    return {i: r + 1 for r, (i, _) in enumerate(ordered)}


def test_bucket_join_degrades_to_sort_merge_above_limit(spark, monkeypatch):
    """A bucket domain wider than the broadcast limit must (a) still rank
    correctly and (b) plan the phase-3 join as sort-merge, not a forced
    broadcast — the guard, not the caller, enforces driver safety."""
    monkeypatch.setattr(ranking, "BROADCAST_BUCKET_LIMIT", 4)
    rows = [(i, float(i % 37)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v double")
    # per-value buckets: 37 occupied buckets > the patched limit of 4
    out = two_phase_rank(df, F.col("v").cast("int"), ["v", "id"], rank_col="r")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    got = {r["id"]: r["r"] for r in out.collect()}
    assert got == _expected_rank(rows)


def test_bucket_join_broadcasts_below_limit(spark):
    """The domain-bounded fast path is unchanged: a handful of occupied
    buckets still broadcasts (phase 3 stays shuffle-free on the data
    side)."""
    rows = [(i, float(i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = two_phase_rank(df, F.col("v").cast("int"), ["v", "id"], rank_col="r")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    got = {r["id"]: r["r"] for r in out.collect()}
    assert got == _expected_rank(rows)


def test_running_sum_correct_under_degraded_join(spark, monkeypatch):
    """two_phase_running shares the guarded join; the degraded sort-merge
    posture must preserve exact SUM() OVER semantics."""
    monkeypatch.setattr(ranking, "BROADCAST_BUCKET_LIMIT", 2)
    rows = [(i, i % 11, (i * 7) % 5) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, v long, x long")
    out = two_phase_running(
        df, F.col("v"), ["v", "id"], [("x", "sum", "rs")]
    )
    got = {r["id"]: r["rs"] for r in out.collect()}
    ordered = sorted(rows, key=lambda t: (t[1], t[0]))
    run = 0
    want = {}
    for i, _, x in ordered:
        run += x
        want[i] = run
    assert got == want


def test_guard_counts_buckets_not_rows(spark, monkeypatch):
    """The guard keys on OCCUPIED BUCKETS (the broadcast payload), not on
    input rows: many rows in few buckets must still broadcast."""
    monkeypatch.setattr(ranking, "BROADCAST_BUCKET_LIMIT", 5)
    rows = [(i, float(i % 2)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = two_phase_rank(df, F.col("v").cast("int"), ["v", "id"], rank_col="r")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
