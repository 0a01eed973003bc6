"""Source/sink format breadth: the same relation must round-trip through
parquet, ORC, CSV, and JSON with schema/values preserved (header+schema
on CSV; explicit schema on JSON — inference is the anti-pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.session import load_table


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_format_round_trip(spark, tmp_path, fmt):
    src = (
        load_table(spark, "/root/testdata/sf0.001", "customer")
        .select("c_custkey", "c_name", "c_nationkey", F.round("c_acctbal", 2).alias("c_acctbal"))
        .orderBy("c_custkey")
    )
    path = str(tmp_path / fmt)
    writer = src.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.format(fmt).save(path)

    reader = spark.read
    if fmt in ("csv", "json"):
        # explicit schema: no inference pass, stable types (SURVEY §4.1)
        reader = reader.schema(src.schema)
        if fmt == "csv":
            reader = reader.option("header", True)
    back = reader.format(fmt).load(path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
