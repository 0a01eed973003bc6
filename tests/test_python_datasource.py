"""Custom Python Data Source: registration, parallelism, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.sources.python_datasource import (
    PostingEmulatorDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(PostingEmulatorDataSource)


def _read(spark, **opts):
    r = spark.read.format("posting_emulator")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_reads_requested_rows_across_partitions(spark):
    df = _read(spark, entity="pin", rows=1000, partitions=8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    assert df.columns[0] == "index"


def test_same_options_same_data(spark):
    a = _read(spark, entity="user", rows=300, partitions=4, seed=7)
    b = _read(spark, entity="user", rows=300, partitions=4, seed=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_index_is_cross_entity_join_key(spark):
    pin = _read(spark, entity="pin", rows=400, partitions=4)
    geo = _read(spark, entity="geo", rows=400, partitions=4)
    # aligned triplets: every pin index has exactly one geo row
    assert pin.join(geo, "index").count() == 400
    assert pin.select(F.countDistinct("index")).first()[0] == 400


def test_source_feeds_cleaning_pipeline(spark):
    from pinterest_data_pipeline_spark.operators import cleaning

    raw = _read(spark, entity="pin", rows=500, partitions=4)
    cleaned = cleaning.clean_pin(raw)
    assert cleaned.filter(F.col("ind").isNull()).count() == 0
    assert dict(cleaned.dtypes)["follower_count"] == "int"


def test_dup_frac_option_plants_duplicates(spark):
    df = _read(spark, entity="pin", rows=500, partitions=4, dup_frac=0.1)
    assert df.count() > 500  # planted dups beyond the base rows
    assert df.dropDuplicates().count() <= df.count()


def test_stream_reader_drains_to_max_rows(spark, tmp_path):
    stream = (
        spark.readStream.format("posting_emulator")
        .option("entity", "pin")
        .option("rows_per_batch", 100)
        .option("max_rows", 250)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("emu_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    deadline = time.time() + 90
    while time.time() < deadline:
        if spark.table("emu_stream").count() >= 250:
            break
        time.sleep(1)
    q.stop()
    got = spark.table("emu_stream")
    assert got.count() == 250
    assert got.select("index").distinct().count() == 250  # offset-rebased, no overlap


def test_stream_reader_offsets_resume_after_restart():
    """A rebuilt reader (checkpoint restart) must not re-announce offsets
    behind the recovered start: the replayed batch's start and commit()
    both advance the driver-side counter (driver-only logic, no Spark)."""
    from pinterest_data_pipeline_spark.sources.python_datasource import (
        PostingEmulatorStreamReader,
    )

    r = PostingEmulatorStreamReader({"rows_per_batch": "100"})
    # restart with a pending batch: engine replays [500, 600) before commit
    r.partitions({"index": 500}, {"index": 600})
    assert r.latestOffset() == {"index": 700}
    r.commit({"index": 700})
    assert r.latestOffset() == {"index": 800}
    # a clean restart that only sees commit() recovers too
    r2 = PostingEmulatorStreamReader({"rows_per_batch": "100"})
    r2.commit({"index": 900})
    assert r2.latestOffset() == {"index": 1000}
