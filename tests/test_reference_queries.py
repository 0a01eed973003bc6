"""Q1-Q9 over cleaned fixtures, each cross-checked against a DuckDB oracle.

The driver's oracle gate covers the testdata battery; this test gives the
same Spark-vs-DuckDB guarantee for the reference's own entity queries, which
run over generated pin/geo/user fixtures instead.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pinterest_data_pipeline_spark.operators import cleaning
from pinterest_data_pipeline_spark.plans import reference_queries as rq


@pytest.fixture(scope="module")
def cleaned(raw_entities, tmp_path_factory):
    pin_raw, geo_raw, user_raw = raw_entities
    pin = cleaning.clean_pin(pin_raw).cache()
    geo = cleaning.clean_geo(geo_raw).cache()
    user = cleaning.clean_user(user_raw).cache()
    # land the cleaned tables as parquet for the DuckDB side
    d = tmp_path_factory.mktemp("cleaned")
    pin.write.mode("overwrite").parquet(str(d / "pin.parquet"))
    geo.drop("coordinates").write.mode("overwrite").parquet(str(d / "geo.parquet"))
    user.write.mode("overwrite").parquet(str(d / "user.parquet"))
    con = duckdb.connect()
    for t in ("pin", "geo", "user"):
        con.execute(
            f'CREATE VIEW "{t}" AS SELECT * FROM read_parquet(\'{d}/{t}.parquet/*.parquet\')'
        )
    return pin, geo, user, con


AGE_CASE = """CASE WHEN age BETWEEN 18 AND 24 THEN '18-24'
                   WHEN age BETWEEN 25 AND 35 THEN '25-35'
                   WHEN age BETWEEN 36 AND 50 THEN '36-50'
                   WHEN age > 50 THEN '50+' END"""


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return f"{v:.6f}" if not math.isnan(v) else "nan"
    return str(v)


def assert_same(sdf, con, sql):
    scols = sdf.columns
    srows = sorted(
        tuple(_norm(r[c]) for c in sorted(scols)) for r in sdf.collect()
    )
    cur = con.execute(sql)
    dcols = [d[0] for d in cur.description]
    assert sorted(scols) == sorted(dcols)
    order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    drows = sorted(tuple(_norm(r[i]) for i in order) for r in cur.fetchall())
    assert srows == drows


def test_q1(cleaned):
    pin, geo, user, con = cleaned
    assert_same(
        rq.q1_top_category_per_country(pin, geo),
        con,
        """WITH c AS (SELECT g.country, p.category, count(*) AS category_count
                     FROM pin p JOIN geo g USING (ind)
                     GROUP BY g.country, p.category),
               r AS (SELECT *, rank() OVER (PARTITION BY country
                                            ORDER BY category_count DESC) rk FROM c)
           SELECT country, category, category_count FROM r WHERE rk = 1""",
    )


def test_q2(cleaned):
    pin, geo, user, con = cleaned
    assert_same(
        rq.q2_category_counts_per_year(pin, geo),
        con,
        """SELECT year("timestamp")::int AS post_year, category,
                  count(*) AS category_count
           FROM pin JOIN geo USING (ind)
           WHERE year("timestamp") BETWEEN 2018 AND 2022
           GROUP BY 1, 2""",
    )


def test_q3(cleaned):
    pin, geo, user, con = cleaned
    assert_same(
        rq.q3_top_user_per_country(pin, geo),
        con,
        """WITH j AS (SELECT g.country, p.poster_name, p.follower_count
                     FROM pin p JOIN geo g USING (ind)
                     WHERE p.follower_count IS NOT NULL),
               r AS (SELECT *, rank() OVER (PARTITION BY country
                                            ORDER BY follower_count DESC) rk FROM j)
           SELECT country, poster_name, max(follower_count) AS follower_count
           FROM r WHERE rk = 1 GROUP BY country, poster_name""",
    )


def test_q4_is_global_top1(cleaned):
    pin, geo, user, con = cleaned
    out = rq.q4_country_with_top_user(pin, geo).collect()
    assert len(out) == 1
    top = con.execute(
        """WITH j AS (SELECT g.country, p.follower_count
                     FROM pin p JOIN geo g USING (ind)
                     WHERE p.follower_count IS NOT NULL)
           SELECT max(follower_count) FROM j"""
    ).fetchone()[0]
    assert out[0].follower_count == top


def test_q5(cleaned):
    pin, geo, user, con = cleaned
    assert_same(
        rq.q5_top_category_per_age_group(pin, user),
        con,
        f"""SELECT {AGE_CASE} AS age_group, category, count(*) AS category_count
            FROM pin JOIN "user" USING (ind) GROUP BY 1, 2""",
    )


def test_q6(cleaned):
    pin, geo, user, con = cleaned
    assert_same(
        rq.q6_median_followers_per_age_group(pin, user),
        con,
        f"""SELECT {AGE_CASE} AS age_group,
                   quantile_cont(follower_count, 0.5) AS median_follower_count
            FROM pin JOIN "user" USING (ind) GROUP BY 1""",
    )


def test_q7(cleaned):
    pin, geo, user, con = cleaned
    assert_same(
        rq.q7_users_joined_per_year(user),
        con,
        """SELECT year(date_joined)::int AS join_year,
                  count(*) AS number_users_joined
           FROM "user" WHERE year(date_joined) BETWEEN 2015 AND 2020 GROUP BY 1""",
    )


def test_q8(cleaned):
    pin, geo, user, con = cleaned
    assert_same(
        rq.q8_median_followers_by_join_year(pin, user),
        con,
        """SELECT year(date_joined)::int AS join_year,
                  quantile_cont(follower_count, 0.5) AS median_follower_count
           FROM pin JOIN "user" USING (ind)
           WHERE year(date_joined) BETWEEN 2015 AND 2020 GROUP BY 1""",
    )


def test_q9(cleaned):
    pin, geo, user, con = cleaned
    assert_same(
        rq.q9_median_followers_by_join_year_and_age(pin, user),
        con,
        f"""SELECT year(date_joined)::int AS join_year, {AGE_CASE} AS age_group,
                   quantile_cont(follower_count, 0.5) AS median_follower_count
            FROM pin JOIN "user" USING (ind)
            WHERE year(date_joined) BETWEEN 2015 AND 2020 GROUP BY 1, 2""",
    )


def test_q6_approx_variant_runs(cleaned):
    # percentile_approx is the 100 TB path; same schema, plausible values.
    pin, geo, user, con = cleaned
    exact = {r.age_group: r.median_follower_count
             for r in rq.q6_median_followers_per_age_group(pin, user).collect()}
    approx = {r.age_group: r.median_follower_count
              for r in rq.q6_median_followers_per_age_group(pin, user, approx=True).collect()}
    assert set(exact) == set(approx)
