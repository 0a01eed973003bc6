"""Unit tests for the cleaning operator library (SURVEY.md §2.2/§2.7).

Micro-fixtures assert exact reference semantics (sentinels, leading-space
prefix strip, k/M parsing intended + strict, bucket edges, tie survival).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from pinterest_data_pipeline_spark.operators import cleaning
from pinterest_data_pipeline_spark.schemas import (
    GEO_CLEAN_COLUMNS,
    PIN_CLEAN_COLUMNS,
    USER_CLEAN_COLUMNS,
)


def test_normalize_nulls_sentinels_and_empty(spark):
    df = spark.createDataFrame(
        [("User Info Error", "ok", ""), ("No Title Data Available", None, "x")],
        ["a", "b", "c"],
    )
    out = cleaning.normalize_nulls(df).collect()
    assert out[0].a is None and out[0].b == "ok" and out[0].c is None
    assert out[1].a is None and out[1].b is None and out[1].c == "x"


def test_normalize_nulls_matches_all_columns_not_per_column(spark):
    # The sentinel list is global: "Image src error" nulls out even in title.
    df = spark.createDataFrame([("Image src error",)], ["title"])
    assert cleaning.normalize_nulls(df).collect()[0].title is None


def test_normalize_nulls_preserves_non_string_columns(spark):
    df = spark.createDataFrame([(1, "")], ["i", "s"])
    row = cleaning.normalize_nulls(df).collect()[0]
    assert row.i == 1 and row.s is None


def test_strip_save_location_prefix_keeps_leading_space(spark):
    # Strict reproduction of BATCH:89: pattern has no trailing space.
    df = spark.createDataFrame([("Local save in /data/art",)], ["save_location"])
    out = df.select(
        cleaning.strip_save_location_prefix(F.col("save_location")).alias("s")
    ).collect()
    assert out[0].s == " /data/art"


def test_parse_human_count_intended(spark):
    df = spark.createDataFrame(
        [("25k",), ("2M",), ("532",), ("3.5k",), (None,), ("garbage",)], ["fc"]
    )
    out = [r.v for r in df.select(cleaning.parse_human_count(F.col("fc")).alias("v")).collect()]
    assert out == [25000, 2000000, 532, 3500, None, None]


def test_parse_human_count_strict_reproduces_reference_bug(spark):
    # As written in BATCH:90-91: "25k" -> 25, "2M" -> 2000.
    df = spark.createDataFrame([("25k",), ("2M",), ("532",)], ["fc"])
    out = [
        r.v
        for r in df.select(cleaning.parse_human_count_strict(F.col("fc")).alias("v")).collect()
    ]
    assert out == [25, 2000, 532]


def test_age_group_boundaries(spark):
    df = spark.createDataFrame([(a,) for a in [17, 18, 24, 25, 35, 36, 50, 51]], ["age"])
    out = [r.g for r in df.select(cleaning.age_group(F.col("age")).alias("g")).collect()]
    assert out == [None, "18-24", "18-24", "25-35", "25-35", "36-50", "36-50", "50+"]


def test_dedup_removes_full_row_duplicates(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (1, "b")], ["k", "v"])
    assert cleaning.dedup(df).count() == 2
    assert cleaning.dedup(df, keys=["k"]).count() == 1


def test_clean_pin_schema_and_values(raw_entities):
    pin_raw, _, _ = raw_entities
    out = cleaning.clean_pin(pin_raw)
    assert out.columns == PIN_CLEAN_COLUMNS
    assert dict(out.dtypes)["follower_count"] == "int"
    assert dict(out.dtypes)["downloaded"] == "boolean"
    assert dict(out.dtypes)["ind"] == "int"
    rows = out.collect()
    # dedup happened: index is unique post-clean for this fixture
    inds = [r.ind for r in rows]
    assert len(inds) == len(set(inds))
    for r in rows:
        assert r.save_location is None or not r.save_location.startswith("Local save in")
        for col in ("title", "description", "poster_name", "tag_list", "image_src"):
            assert getattr(r, col) not in cleaning.SENTINELS and getattr(r, col) != ""


def test_clean_geo_schema_and_values(raw_entities):
    _, geo_raw, _ = raw_entities
    out = cleaning.clean_geo(geo_raw)
    assert out.columns == GEO_CLEAN_COLUMNS
    assert dict(out.dtypes)["timestamp"] == "timestamp"
    assert dict(out.dtypes)["coordinates"] == "array<string>"
    for r in out.collect():
        assert r.country == r.country.strip()
        assert len(r.coordinates) == 2


def test_clean_user_schema_and_values(raw_entities):
    _, _, user_raw = raw_entities
    out = cleaning.clean_user(user_raw)
    assert out.columns == USER_CLEAN_COLUMNS
    rows = out.collect()
    inds = [r.ind for r in rows]
    assert len(inds) == len(set(inds))  # real dedup (divergence from no-op BATCH:139)
    for r in rows:
        assert " " in r.user_name


def test_clean_pin_no_orderby_but_deterministic_content(raw_entities):
    pin_raw, _, _ = raw_entities
    a = sorted(cleaning.clean_pin(pin_raw).collect())
    b = sorted(cleaning.clean_pin(pin_raw).collect())
    assert a == b


def test_normalize_text_canonicalizes(spark):
    from pinterest_data_pipeline_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [("Hello,  World!",), ("hello world",), ("  HELLO   world.  ",), ("a1-b2",)],
        "t string",
    ).select(normalize_text(F.col("t")).alias("n"))
    got = [r.n for r in df.collect()]
    assert got[0] == got[1] == got[2] == "hello world"
    assert got[3] == "a1 b2"
