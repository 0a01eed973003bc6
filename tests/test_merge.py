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


# --- snapshot_diff (CDC) ----------------------------------------------------


def test_snapshot_diff_classifies_changes(spark):
    from pinterest_data_pipeline_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, None)], "id long, val double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (4, 40.0), (5, 50.0)], "id long, val double"
    )
    got = {
        r.id: (r.change_type, r.old_val, r.new_val)
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    # id 1 unchanged -> absent; null -> value counts as update (null-safe)
    assert got == {
        2: ("update", 20.0, 25.0),
        3: ("delete", 30.0, None),
        4: ("update", None, 40.0),
        5: ("insert", None, 50.0),
    }


def test_snapshot_diff_reconstructs_new_snapshot(spark):
    """Applying the change feed to the old snapshot must rebuild the new
    one exactly: upsert the insert/update rows, remove the delete keys —
    the round-trip property that makes the diff a usable CDC source."""
    import random

    from pinterest_data_pipeline_spark.operators.merge import merge_into, snapshot_diff

    rng = random.Random(42)
    old_rows = [(i, rng.choice("abc"), round(rng.uniform(0, 100), 2)) for i in range(200)]
    new_rows = []
    for i, s, v in old_rows:
        roll = rng.random()
        if roll < 0.2:
            continue  # deleted
        if roll < 0.5:
            new_rows.append((i, rng.choice("abc"), round(v + 1, 2)))  # updated
        else:
            new_rows.append((i, s, v))  # unchanged
    new_rows += [(1000 + i, "z", float(i)) for i in range(20)]  # inserts
    schema = "id long, seg string, val double"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)

    diff = snapshot_diff(old, new, ["id"])
    upserts = diff.filter(F.col("change_type") != "delete").select(
        "id", F.col("new_seg").alias("seg"), F.col("new_val").alias("val")
    )
    deletes = diff.filter(F.col("change_type") == "delete").select("id")
    rebuilt = merge_into(
        merge_into(old, upserts, ["id"]), deletes, ["id"],
        insert=False, delete_matched=True,
    )
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))
