"""Bench-battery derivation pins (VERDICT r11 item 5): the headline set
is registry minus an explicit per-name exclusion dict, so a new birth
cannot silently fall out of the bench — it is either benched or named
here with a reason."""

from __future__ import annotations

import bench
from pinterest_data_pipeline_spark.plans import analytics


def test_headline_is_registry_minus_exclusions():
    registry = set(analytics.QUERIES)
    headline = set(bench.HEADLINE)
    exclusions = set(bench.BENCH_EXCLUSIONS)
    assert headline == registry - exclusions
    assert headline | exclusions == registry
    assert not headline & exclusions


def test_exclusions_name_registered_queries_with_reasons():
    registry = set(analytics.QUERIES)
    stale = set(bench.BENCH_EXCLUSIONS) - registry
    assert not stale, f"stale exclusion entries: {sorted(stale)}"
    for name, why in bench.BENCH_EXCLUSIONS.items():
        assert isinstance(why, str) and len(why) >= 10, name


def test_headline_has_no_duplicates_and_follows_registry_order():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    order = {n: i for i, n in enumerate(analytics.QUERIES)}
    idx = [order[n] for n in bench.HEADLINE]
    assert idx == sorted(idx)
