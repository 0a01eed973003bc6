"""Quality expectations: violation detection and single-pass evaluation."""

from __future__ import annotations

from pinterest_data_pipeline_spark.operators import quality as Q


def test_checks_detect_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (2, None, -1.0)],
        "id long, name string, val double",
    )
    report = {
        r.check_name: (r.observed, r.passed)
        for r in Q.run_checks(
            df,
            [
                Q.unique("id"),  # dup id=2 -> fail
                Q.not_null("name"),  # one null of three -> fail
                Q.not_null("name", 0.5),  # 50% tolerance -> pass
                Q.in_range("val", 0.0, 100.0),  # -1 out of range -> fail
                Q.row_count_at_least(3),  # pass
            ],
        ).collect()
    }
    assert report["unique(id)"] == (1.0, False)
    assert report["not_null(name)"] == (round(1 / 3, 6), False)
    assert report["not_null(name,max=0.5)"] == (round(1 / 3, 6), True)
    assert report["in_range(val,0.0,100.0)"] == (1.0, False)
    assert report["row_count_at_least(3)"] == (3.0, True)


def test_all_checks_one_scan(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, val double")
    plan = Q.run_checks(
        df, [Q.unique("id"), Q.in_range("val", 0, 10), Q.row_count_at_least(1)]
    )._jdf.queryExecution().executedPlan().toString()
    # one aggregation over one scan: no joins, no repeated source scans
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1


def test_observed_write_collects_metrics_in_one_job(spark, tmp_path):
    from pyspark.sql import functions as F

    from pinterest_data_pipeline_spark.session import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    got = Q.observed_write(
        orders,
        str(tmp_path / "out"),
        {
            "n_rows": F.count(F.lit(1)),
            "null_custkeys": F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)),
            "total_price": F.round(F.sum("o_totalprice"), 2),
        },
    )
    n = orders.count()
    assert got["n_rows"] == n
    assert got["null_custkeys"] == 0
    assert abs(got["total_price"] - round(sum(r.o_totalprice for r in orders.collect()), 2)) < 1.0
    assert spark.read.parquet(str(tmp_path / "out")).count() == n


def test_profile_columns_counts_nulls_and_bounds(spark):
    from pinterest_data_pipeline_spark.operators.quality import profile_columns

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 8.0, None), (4, 8.0, "b")],
        "id long, v double, s string",
    )
    rows = {r.column_name: r for r in profile_columns(df, ["id", "v"], ["s"]).collect()}
    assert rows["id"].n_rows == 4 and rows["id"].n_nulls == 0
    assert rows["id"].n_distinct == 4
    assert rows["id"].min_value == 1.0 and rows["id"].max_value == 4.0
    assert rows["v"].n_nulls == 1 and rows["v"].n_distinct == 2
    assert rows["v"].min_value == 2.0 and rows["v"].max_value == 8.0
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_value is None and rows["s"].max_value is None
