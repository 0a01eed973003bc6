"""Bucketed co-located join: the write-time shuffle removes the read-time one."""

from __future__ import annotations

import pytest

from pinterest_data_pipeline_spark.session import load_table
from pinterest_data_pipeline_spark.sources.bucketing import (
    cobucket_for_join,
    compact_json_landing,
)

SF = "/root/testdata/sf0.001"


def test_compact_json_landing_round_trips_and_sizes(spark, tmp_path):
    """One-record-per-file landing zone -> few sized parquet files."""
    import json

    from pinterest_data_pipeline_spark.schemas import PIN_RAW_SCHEMA
    from pinterest_data_pipeline_spark.sources.generator import make_raw_entities

    pins, _, _ = make_raw_entities(n=200, seed=2)
    src = tmp_path / "landing"
    src.mkdir()
    for i, row in enumerate(pins):  # flush.size=1 pathology reproduced
        (src / f"rec-{i}.json").write_text(json.dumps(row))
    dst = str(tmp_path / "compact")
    n_files = compact_json_landing(spark, str(src), dst, PIN_RAW_SCHEMA, target_mb=128)
    assert n_files == 1  # tiny input -> one full file, not 210 shards
    back = spark.read.parquet(dst)
    assert back.count() == len(pins)
    assert {r["index"] for r in back.select("index").collect()} == {p["index"] for p in pins}


@pytest.fixture()
def no_broadcast(spark):
    """Force the join planner away from broadcast so the exchange behavior
    of the shuffle path is observable at test scale."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle_exchange(spark, no_broadcast):
    # managed tables land in the session's default warehouse dir
    # (spark-warehouse/, gitignored); overwrite mode keeps reruns clean
    li, orders = cobucket_for_join(
        spark,
        load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity"),
        load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice"),
        "l_orderkey",
        "o_orderkey",
        names=("li_bucketed", "ord_bucketed"),
        buckets=8,
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan

    # un-bucketed control: the same join must shuffle both sides
    li_raw = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    ord_raw = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    control = li_raw.join(ord_raw, li_raw.l_orderkey == ord_raw.o_orderkey)
    control_plan = control._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in control_plan

    # and of course the rows are identical
    assert joined.count() == control.count()
