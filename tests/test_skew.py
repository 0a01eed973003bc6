"""Salted aggregate/join must be result-identical to their plain forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators.skew import salted_aggregate, salted_join


def _skewed(spark):
    # 90% of rows share one hot key
    return spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        (F.col("id") % 100).alias("v"),
    )


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    salted = salted_aggregate(
        df, ["k"],
        {"n": ("*", "count"), "s": ("v", "sum"), "lo": ("v", "min"), "hi": ("v", "max")},
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(7)], ["sk", "label"]
    )
    plain = big.join(small, big["k"] == small["sk"]).drop("sk")
    salted = salted_join(big, small, on=("k", "sk"), n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    assert plain.count() == 5000
