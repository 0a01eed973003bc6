"""Explicit schemas for the three raw entity tables and their cleaned targets.

The reference infers the batch schema from JSON (reference
``databricks_notebooks/pintrest_batch_data_transformation.py:58-60``) — an
extra full pass over the input — but declares explicit ``StructType`` schemas
on the stream side (``pintrest_stream_data_transformation.py:66-105``). This
engine declares schemas everywhere: at 100 TB an inference pass is a second
scan of the lake, and schema drift should fail loudly at the read, not
downstream.

Raw column shapes follow FIXTURES.md §1-§3 / reference README.md:71-105;
cleaned targets follow README.md:128-161.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- raw wire schemas (everything a string except the join key) -------------

PIN_RAW_SCHEMA = T.StructType(
    [
        T.StructField("index", T.IntegerType()),
        T.StructField("unique_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("poster_name", T.StringType()),
        T.StructField("follower_count", T.StringType()),
        T.StructField("tag_list", T.StringType()),
        T.StructField("is_image_or_video", T.StringType()),
        T.StructField("image_src", T.StringType()),
        T.StructField("downloaded", T.StringType()),
        T.StructField("save_location", T.StringType()),
        T.StructField("category", T.StringType()),
    ]
)

GEO_RAW_SCHEMA = T.StructType(
    [
        T.StructField("index", T.IntegerType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("latitude", T.StringType()),
        T.StructField("longitude", T.StringType()),
        T.StructField("country", T.StringType()),
    ]
)

USER_RAW_SCHEMA = T.StructType(
    [
        T.StructField("index", T.IntegerType()),
        T.StructField("date_joined", T.StringType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("age", T.IntegerType()),
    ]
)

# --- cleaned target schemas (README.md:128-161; column order BATCH:99/123/151)

PIN_CLEAN_COLUMNS = [
    "ind",
    "unique_id",
    "title",
    "description",
    "follower_count",
    "poster_name",
    "tag_list",
    "is_image_or_video",
    "image_src",
    "save_location",
    "category",
    "downloaded",
]

GEO_CLEAN_COLUMNS = ["ind", "country", "coordinates", "timestamp"]

USER_CLEAN_COLUMNS = ["ind", "user_name", "age", "date_joined"]

# Kinesis-style wire envelope for the streaming landing files (FIXTURES.md §5).
STREAM_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("StreamName", T.StringType()),
        T.StructField("Data", T.StringType()),
        T.StructField("PartitionKey", T.StringType()),
    ]
)
