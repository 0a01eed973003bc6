"""MERGE INTO semantics on micro-fixtures: update/insert/delete clauses,
column-subset sources, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.merge import merge_into


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, val double",
    )


def test_merge_updates_matched_and_inserts_new(spark):
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "id long, name string, val double"
    )
    got = {r.id: (r.name, r.val) for r in merge_into(_target(spark), source, ["id"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_source_column_subset_preserves_target_values(spark):
    source = spark.createDataFrame([(2, 99.0), (4, 40.0)], "id long, val double")
    got = {r.id: (r.name, r.val) for r in merge_into(_target(spark), source, ["id"]).collect()}
    assert got[2] == ("b", 99.0)  # unlisted column keeps target value
    assert got[4] == (None, 40.0)  # insert with missing column -> NULL


def test_merge_without_insert_drops_source_only_keys(spark):
    source = spark.createDataFrame([(2, 99.0), (4, 40.0)], "id long, val double")
    got = merge_into(_target(spark), source, ["id"], insert=False)
    assert {r.id for r in got.collect()} == {1, 2, 3}


def test_merge_delete_matched(spark):
    source = spark.createDataFrame([(2, 0.0)], "id long, val double")
    got = merge_into(_target(spark), source, ["id"], delete_matched=True, insert=False)
    assert {r.id for r in got.collect()} == {1, 3}


def test_merge_plans_single_shuffle_join_no_cartesian(spark):
    source = spark.createDataFrame([(2, 99.0)], "id long, val double")
    plan = merge_into(
        _target(spark), source, ["id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_scd2_history_intervals_and_collapse(spark):
    from pinterest_data_pipeline_spark.operators.merge import scd2_history

    snaps = spark.createDataFrame(
        [
            (1, "A", "2020-01-01"),
            (1, "B", "2020-06-01"),
            (1, "B", "2021-01-01"),  # identical re-observation: must collapse
            (1, "C", "2021-06-01"),
            (2, "X", "2020-01-01"),
        ],
        "id long, seg string, ts string",
    ).withColumn("ts", F.to_date("ts"))
    rows = sorted(
        (r.id, r.seg, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in scd2_history(snaps, "id", "ts", ["seg"]).collect()
    )
    assert rows == [
        (1, "A", "2020-01-01", "2020-06-01", False),
        (1, "B", "2020-06-01", "2021-06-01", False),  # spans the collapse
        (1, "C", "2021-06-01", "None", True),
        (2, "X", "2020-01-01", "None", True),
    ]
