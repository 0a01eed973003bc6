"""Unit tests for as-of / range joins and approx-aggregate error bounds."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.joins import asof_join, range_join


def _d(day):
    return datetime.date(2024, 1, day)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "u1", _d(5)), (2, "u1", _d(10)), (3, "u2", _d(5)), (4, "u3", _d(5))],
        ["event_id", "uid", "obs_date"],
    )
    right = spark.createDataFrame(
        [("u1", _d(1), 10.0), ("u1", _d(5), 20.0), ("u1", _d(7), 30.0), ("u2", _d(6), 99.0)],
        ["cust", "obs_date", "spend"],
    )
    out = {
        r.event_id: r.spend_asof
        for r in asof_join(
            left, right, on="obs_date", by=("uid", "cust"), value_cols=["spend"]
        ).collect()
    }
    assert out[1] == 20.0  # equal date counts (backward >= semantics)
    assert out[2] == 30.0  # latest of several earlier rows
    assert out[3] is None  # only later right rows exist -> no match
    assert out[4] is None  # key absent from right -> no match


def test_asof_join_keeps_all_left_rows_and_columns(spark):
    left = spark.createDataFrame([(1, "u1", _d(5), "x")], ["id", "uid", "obs_date", "payload"])
    right = spark.createDataFrame([("u1", _d(4), 7.0)], ["cust", "obs_date", "v"])
    out = asof_join(left, right, on="obs_date", by=("uid", "cust"), value_cols=["v"])
    assert out.columns == ["id", "uid", "obs_date", "payload", "v_asof"]
    assert out.count() == left.count()


def test_asof_join_forward_picks_earliest_at_or_after(spark):
    left = spark.createDataFrame(
        [(1, "u1", _d(5)), (2, "u1", _d(8)), (3, "u2", _d(7)), (4, "u3", _d(5))],
        ["event_id", "uid", "obs_date"],
    )
    right = spark.createDataFrame(
        [("u1", _d(1), 10.0), ("u1", _d(5), 20.0), ("u1", _d(7), 30.0), ("u2", _d(6), 99.0)],
        ["cust", "obs_date", "spend"],
    )
    out = {
        r.event_id: r.spend_next
        for r in asof_join(
            left,
            right,
            on="obs_date",
            by=("uid", "cust"),
            value_cols=["spend"],
            suffix="_next",
            direction="forward",
        ).collect()
    }
    assert out[1] == 20.0  # equal date counts (forward <= semantics)
    assert out[2] is None  # only earlier right rows exist -> no match
    assert out[3] is None  # u2's only order is before the event
    assert out[4] is None  # key absent from right -> no match


def test_range_join_band_containment(spark):
    left = spark.createDataFrame([(1, _d(5)), (1, _d(20)), (2, _d(5))], ["k", "p"])
    right = spark.createDataFrame(
        [(1, _d(1), _d(10)), (2, _d(6), _d(10))], ["rk", "lo", "hi"]
    )
    out = range_join(left, right, equi=("k", "rk"), point="p", lower="lo", upper="hi")
    rows = [(r.k, r.p) for r in out.collect()]
    assert rows == [(1, _d(5))]  # (1,20) outside band; (2,5) before band


def test_approx_count_distinct_error_bound(spark):
    df = spark.range(0, 20000).select((F.col("id") % 4321).alias("v"))
    # default rsd is 0.05 (one sigma); request 0.01 for a tight check and
    # allow 3 sigma either way
    approx = df.agg(F.approx_count_distinct("v", 0.01).alias("a")).first().a
    assert abs(approx - 4321) / 4321 < 0.03


def test_percentile_approx_close_to_exact(spark):
    df = spark.range(0, 10001).select(F.col("id").cast("double").alias("v"))
    row = df.agg(
        F.percentile_approx("v", 0.5).alias("approx"),
        F.percentile("v", F.lit(0.5)).alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) <= 100  # within 1% of the range


def test_fuzzy_join_blocking_loses_no_pairs(spark):
    """Length-bucket blocking must find every pair an exhaustive scan finds,
    including pairs whose lengths straddle a bucket boundary."""
    from itertools import combinations

    from pinterest_data_pipeline_spark.operators.joins import fuzzy_self_join

    vals = ["ab", "abc", "abcd", "abcde", "xyz", "xyzzy", "abf", "kl"]
    df = spark.createDataFrame([(v,) for v in vals], "name string")
    got = {
        (r.val_a, r.val_b, r.edit_distance)
        for r in fuzzy_self_join(df, "name", max_distance=2).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = {
        (min(a, b), max(a, b), lev(a, b))
        for a, b in combinations(set(vals), 2)
        if lev(a, b) <= 2
    }
    assert got == want and len(want) > 3
