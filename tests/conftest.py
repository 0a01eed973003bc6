"""Shared pytest fixtures: one SparkSession for the whole test run."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pinterest_data_pipeline_spark.session import get_spark, release_scoped  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small core/partition count: tests favor startup + scheduling latency
    # over parallel throughput.
    s = get_spark("tests", cpus=4)
    yield s
    release_scoped()


@pytest.fixture(scope="session")
def raw_entities(spark):
    """Small dirty pin/geo/user raw DataFrames (FIXTURES.md shapes)."""
    from pinterest_data_pipeline_spark.schemas import (
        GEO_RAW_SCHEMA,
        PIN_RAW_SCHEMA,
        USER_RAW_SCHEMA,
    )
    from pinterest_data_pipeline_spark.sources.generator import make_raw_entities

    pins, geos, users = make_raw_entities(n=300, seed=7)
    return (
        spark.createDataFrame(pins, PIN_RAW_SCHEMA),
        spark.createDataFrame(geos, GEO_RAW_SCHEMA),
        spark.createDataFrame(users, USER_RAW_SCHEMA),
    )
