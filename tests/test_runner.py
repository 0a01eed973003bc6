"""End-to-end batch runner test: land -> clean -> Q1-Q9 -> parquet answers."""

from __future__ import annotations

import runner


def test_runner_end_to_end_and_idempotent(spark, tmp_path):
    landing, out = str(tmp_path / "landing"), str(tmp_path / "answers")
    runner.land_raw(landing, rows=300, seed=13)
    counts1 = runner.run_batch(spark, landing, out)
    assert set(counts1) == {
        "q1_top_category_per_country",
        "q2_category_counts_per_year",
        "q3_top_user_per_country",
        "q4_country_with_top_user",
        "q5_top_category_per_age_group",
        "q6_median_followers_per_age_group",
        "q7_users_joined_per_year",
        "q8_median_followers_by_join_year",
        "q9_median_followers_by_join_year_and_age",
    }
    assert all(n > 0 for n in counts1.values())
    assert counts1["q4_country_with_top_user"] == 1

    # rerun = the Airflow retry story: same landing data, same answers
    counts2 = runner.run_batch(spark, landing, out)
    assert counts2 == counts1

    # approx medians keep the same output shape
    counts3 = runner.run_batch(spark, landing, out, approx=True)
    assert set(counts3) == set(counts1)


def test_with_retries_recovers_from_transient_failure():
    """DAG-parity retry: one transient failure, successful second attempt."""
    from runner import with_retries

    calls = {"n": 0}
    seen = []

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return "ok"

    out = with_retries(
        flaky, retries=2, delay_seconds=0.0, on_error=lambda a, e: seen.append((a, str(e)))
    )
    assert out == "ok"
    assert calls["n"] == 2
    assert seen == [(0, "transient")]


def test_with_retries_exhausts_and_raises():
    from pytest import raises

    from runner import with_retries

    calls = {"n": 0}

    def always_fails():
        calls["n"] += 1
        raise ValueError("permanent")

    with raises(ValueError, match="permanent"):
        with_retries(always_fails, retries=2, delay_seconds=0.0)
    assert calls["n"] == 3  # initial + 2 retries, DAG parity
