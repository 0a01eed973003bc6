"""The reference's eight-question analytical battery, Q1-Q9 (SURVEY.md §2.8).

Each function takes the CLEANED entity DataFrames (``clean_pin``/``clean_geo``
/``clean_user`` outputs) and returns the answer DataFrame. Implemented with
the *intended* semantics per SURVEY.md §5.3 — the reference's degenerate
re-aggregations (Q2), n² windowed count (Q7), and groupby-as-dedup after
windowed percentiles (Q8/Q9) are normalized to the single-level aggregates
they meant; RANK tie semantics (Q1/Q3) are preserved exactly.

Reference sites: ``databricks_notebooks/pintrest_batch_data_transformation.py``
:176-202 (Q1), :211-239 (Q2), :248-274 (Q3), :283-310 (Q4), :323-343 (Q5),
:353-378 (Q6), :388-406 (Q7), :415-438 (Q8), :447-484 (Q9).

Scale notes encoded here rather than left to chance:

* pin⋈geo / pin⋈user are 1:1 equi-joins on ``ind`` — Catalyst/AQE picks
  broadcast vs sort-merge; no hint needed since neither side is a known dim.
* Exact PERCENTILE is a TypedImperativeAggregate (holds a per-group buffer);
  every median query takes ``approx=True`` to switch to
  ``percentile_approx`` — the 100 TB path — with identical output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.cleaning import age_group


def _median(col, approx: bool):
    return F.percentile_approx(col, 0.5) if approx else F.percentile(col, 0.5)


def q1_top_category_per_country(pin: DataFrame, geo: DataFrame) -> DataFrame:
    """Most popular category per country (BATCH:176-202)."""
    counts = (
        pin.join(geo, "ind")
        .groupBy("country", "category")
        .agg(F.count(F.lit(1)).alias("category_count"))
    )
    w = Window.partitionBy("country").orderBy(F.desc("category_count"))
    return (
        counts.withColumn("ranking", F.rank().over(w))
        .filter(F.col("ranking") == 1)
        .select("country", "category", "category_count")
        .orderBy(F.desc("category_count"))
    )


def q2_category_counts_per_year(pin: DataFrame, geo: DataFrame) -> DataFrame:
    """Posts per category per year, 2018-2022 (BATCH:211-239, intended form)."""
    return (
        pin.join(geo, "ind")
        .withColumn("post_year", F.year("timestamp"))
        .filter(F.col("post_year").between(2018, 2022))
        .groupBy("post_year", "category")
        .agg(F.count(F.lit(1)).alias("category_count"))
        .orderBy(F.desc("post_year"))
    )


def q3_top_user_per_country(pin: DataFrame, geo: DataFrame) -> DataFrame:
    """User with most followers per country (BATCH:248-274).

    RANK (not ROW_NUMBER) + rank=1 keeps ties; the trailing
    groupBy(country, poster_name) MAX reproduces the reference's final
    aggregation (dedups multiple rank-1 posts by the same poster).
    """
    w = Window.partitionBy("country").orderBy(F.desc("follower_count"))
    return (
        pin.join(geo, "ind")
        .select("country", "poster_name", "follower_count")
        .filter(F.col("follower_count").isNotNull())
        .withColumn("ranking", F.rank().over(w))
        .filter(F.col("ranking") == 1)
        .groupBy("country", "poster_name")
        .agg(F.max("follower_count").alias("follower_count"))
        .orderBy("follower_count")
    )


def q4_country_with_top_user(pin: DataFrame, geo: DataFrame) -> DataFrame:
    """Country whose top user has the most followers (BATCH:283-310).

    orderBy desc + limit 1 compiles to TakeOrderedAndProject — no global
    sort materializes.
    """
    return (
        q3_top_user_per_country(pin, geo)
        .select("country", "follower_count")
        .orderBy(F.desc("follower_count"))
        .limit(1)
    )


def q5_top_category_per_age_group(pin: DataFrame, user: DataFrame) -> DataFrame:
    """Most popular category per age group (BATCH:323-343)."""
    return (
        pin.join(user, "ind")
        .withColumn("age_group", age_group(F.col("age")))
        .groupBy("age_group", "category")
        .agg(F.count(F.lit(1)).alias("category_count"))
        .orderBy(F.desc("category_count"))
    )


def q6_median_followers_per_age_group(
    pin: DataFrame, user: DataFrame, approx: bool = False
) -> DataFrame:
    """Median follower count per age group (BATCH:353-378)."""
    return (
        pin.join(user, "ind")
        .withColumn("age_group", age_group(F.col("age")))
        .groupBy("age_group")
        .agg(_median(F.col("follower_count"), approx).alias("median_follower_count"))
        .orderBy(F.desc("median_follower_count"))
    )


def q7_users_joined_per_year(user: DataFrame) -> DataFrame:
    """Users joined per year 2015-2020 (BATCH:388-406, intended n not n²)."""
    return (
        user.withColumn("join_year", F.year("date_joined"))
        .filter(F.col("join_year").between(2015, 2020))
        .groupBy("join_year")
        .agg(F.count(F.lit(1)).alias("number_users_joined"))
    )


def q8_median_followers_by_join_year(
    pin: DataFrame, user: DataFrame, approx: bool = False
) -> DataFrame:
    """Median follower count by join year 2015-2020 (BATCH:415-438)."""
    return (
        pin.join(user, "ind")
        .withColumn("join_year", F.year("date_joined"))
        .filter(F.col("join_year").between(2015, 2020))
        .groupBy("join_year")
        .agg(_median(F.col("follower_count"), approx).alias("median_follower_count"))
    )


def q9_median_followers_by_join_year_and_age(
    pin: DataFrame, user: DataFrame, approx: bool = False
) -> DataFrame:
    """Median follower count by join year × age group (BATCH:447-484)."""
    return (
        pin.join(user, "ind")
        .withColumn("age_group", age_group(F.col("age")))
        .withColumn("join_year", F.year("date_joined"))
        .filter(F.col("join_year").between(2015, 2020))
        .groupBy("join_year", "age_group")
        .agg(_median(F.col("follower_count"), approx).alias("median_follower_count"))
    )
