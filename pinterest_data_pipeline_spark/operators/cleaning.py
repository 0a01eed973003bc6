"""Cleaning operator library (SURVEY.md §2.2, §2.7).

One module shared verbatim by the batch and streaming paths — the reference
duplicates the identical chain in two notebooks
(``pintrest_batch_data_transformation.py:76-155`` ≡
``pintrest_stream_data_transformation.py:114-190`` minus the global orderBy);
here it is a single set of pure functions applied to either a static or a
streaming DataFrame (unified Dataset API).

Fidelity policy (SURVEY.md §5.3): reproduce reference semantics exactly,
except the documented intended-vs-as-written divergences. Both variants of
the human-count parser are provided; the pipeline uses the intended one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import GEO_CLEAN_COLUMNS, PIN_CLEAN_COLUMNS, USER_CLEAN_COLUMNS

# Sentinel strings the reference nulls out across ALL pin columns (BATCH:79).
# The list is matched against every column, not per-column.
SENTINELS = [
    "No description available Story format",
    "User Info Error",
    "Image src error",
    "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e",
    "No Title Data Available",
]


def normalize_nulls(df: DataFrame, sentinels: list[str] | None = None) -> DataFrame:
    """P1: map ``""`` and any sentinel value to NULL in every column.

    Reference BATCH:78-86 builds a ``when`` chain per column inside a single
    ``select`` — one projection, no shuffle, fully codegen'd. Same here.
    Non-string columns pass through untouched (the reference's string
    comparison on an int column is a silent no-op; being explicit is free).
    """
    sentinels = SENTINELS if sentinels is None else sentinels
    exprs = []
    for name, dtype in df.dtypes:
        c = F.col(name)
        if dtype == "string":
            exprs.append(null_sentinel(c, sentinels).alias(name))
        else:
            exprs.append(c.alias(name))
    return df.select(*exprs)


def null_sentinel(c: Column, sentinels: list[str]) -> Column:
    """Single-column form of the P1 when-chain: '' or sentinel -> NULL."""
    return F.when(c.isNull() | (c == "") | c.isin(sentinels), F.lit(None)).otherwise(c)


def strip_save_location_prefix(c: Column) -> Column:
    """P2: drop the ``Local save in`` prefix from save_location.

    Strict reproduction of BATCH:89 — the pattern has no trailing space, so
    ``"Local save in /data/x"`` becomes ``" /data/x"`` (leading space kept;
    SURVEY.md §5.3 chose strict mode for this operator).
    """
    return F.regexp_replace(c, r"^Local save in", "")


def parse_human_count(c: Column) -> Column:
    """P3/P4 intended semantics: ``"25k"`` -> 25000, ``"2M"`` -> 2000000.

    The reference's regexes (BATCH:90-91) are lossy as written ("25k" -> 25,
    "2M" -> 2000); per SURVEY.md §5.3 the engine implements the intended
    multipliers. Plain integers pass through; anything else (post
    null-normalization) becomes NULL via the final int cast. Supports
    fractional prefixes ("3.5k" -> 3500) since they round-trip exactly.
    """
    # try_cast, not cast: ANSI mode (Spark 4 default) makes a plain cast of
    # garbage throw; dirty wire data must degrade to NULL, not kill the job.
    num = F.regexp_extract(c, r"^(\d+(?:\.\d+)?)[kM]$", 1).try_cast("double")
    return (
        F.when(c.rlike(r"^\d+(\.\d+)?k$"), (num * 1000).try_cast("long"))
        .when(c.rlike(r"^\d+(\.\d+)?M$"), (num * 1000000).try_cast("long"))
        .otherwise(c.try_cast("long"))
        .try_cast("int")
    )


def parse_human_count_strict(c: Column) -> Column:
    """P3/P4 as-written semantics (documented reference bug, BATCH:90-91).

    ``regexp_replace(c, "(\\d)k$", "$1")`` drops the k entirely;
    ``regexp_replace(c, "(\\d)M$", "$1\\000")`` appends literal ``000``
    (Java treats ``\\000`` in the replacement as escaped zeros).
    """
    replaced = F.regexp_replace(F.regexp_replace(c, r"(\d)k$", r"$1"), r"(\d)M$", r"$1000")
    return replaced.try_cast("int")


def age_group(c: Column) -> Column:
    """P11: CASE bucketing of age (BATCH:325-330 and three duplicate sites).

    Buckets: 18-24, 25-35, 36-50, 50+ (ages below 18 fall through to NULL,
    matching the reference CASE with no ELSE branch).
    """
    return (
        F.when((c >= 18) & (c <= 24), "18-24")
        .when((c >= 25) & (c <= 35), "25-35")
        .when((c >= 36) & (c <= 50), "36-50")
        .when(c > 50, "50+")
        .otherwise(F.lit(None))
    )


def coordinates(lat: Column, lon: Column) -> Column:
    """F4: fold latitude/longitude into one array column (BATCH:115)."""
    return F.array(lat, lon)


def full_name(first: Column, last: Column) -> Column:
    """F2: ``concat(first_name, " ", last_name)`` (BATCH:142)."""
    return F.concat(first, F.lit(" "), last)


def dedup(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """A6: full-row (or key-based) duplicate removal.

    Reference uses full-row ``dropDuplicates()`` (BATCH:76,112,139 — note the
    user-table call discards its result; this engine performs the real dedup,
    a documented divergence). ``keys`` enables the scalable variant: at
    100 TB a full-row shuffle moves every byte once, while key-based dedup
    shuffles only the hash of the dedup key columns' row.
    """
    return df.dropDuplicates(keys) if keys else df.dropDuplicates()


# --- composed entity pipelines ---------------------------------------------


def project_pin(df: DataFrame) -> DataFrame:
    """Pin cleaning chain minus dedup (shared batch/stream, stream-safe).

    null-normalize -> strip save_location prefix -> parse follower_count ->
    cast downloaded boolean -> rename index->ind -> canonical column order.
    Pure projection: no shuffle, applies unchanged to a streaming DataFrame
    (the reference's STREAM:114-140 is this exact chain). No orderBy:
    presentation ordering is the caller's choice (the reference's
    mid-pipeline global sort is a range-partition shuffle whose ordering
    later joins destroy anyway, SURVEY.md §4.1).
    """
    df = normalize_nulls(df)
    df = (
        df.withColumn("save_location", strip_save_location_prefix(F.col("save_location")))
        .withColumn("follower_count", parse_human_count(F.col("follower_count")))
        .withColumn("downloaded", F.col("downloaded").try_cast("boolean"))
        .withColumn("ind", F.col("index").cast("int"))
        .drop("index")
    )
    return df.select(*PIN_CLEAN_COLUMNS)


def project_geo(df: DataFrame) -> DataFrame:
    """Geo cleaning chain minus dedup (shared batch/stream)."""
    df = normalize_nulls(df)
    df = (
        df.withColumn("coordinates", coordinates(F.col("latitude"), F.col("longitude")))
        .drop("latitude", "longitude")
        .withColumn("timestamp", F.to_timestamp(F.col("timestamp")))
        .withColumn("country", F.trim(F.col("country")))
        .withColumn("ind", F.col("index").cast("int"))
        .drop("index")
    )
    return df.select(*GEO_CLEAN_COLUMNS)


def project_user(df: DataFrame) -> DataFrame:
    """User cleaning chain minus dedup (shared batch/stream)."""
    df = normalize_nulls(df)
    df = (
        df.withColumn("user_name", full_name(F.col("first_name"), F.col("last_name")))
        .drop("first_name", "last_name")
        .withColumn("date_joined", F.to_timestamp(F.col("date_joined")))
        .withColumn("age", F.col("age").cast("int"))
        .withColumn("ind", F.col("index").cast("int"))
        .drop("index")
    )
    return df.select(*USER_CLEAN_COLUMNS)


def clean_pin(df: DataFrame) -> DataFrame:
    """Full batch pin cleaning chain (BATCH:76-100): dedup + projection."""
    return project_pin(dedup(df))


def clean_geo(df: DataFrame) -> DataFrame:
    """Full batch geo cleaning chain (BATCH:112-124): dedup + projection."""
    return project_geo(dedup(df))


def clean_user(df: DataFrame) -> DataFrame:
    """Full batch user cleaning chain (BATCH:139-152): dedup + projection.

    The reference's user dedup is a discarded no-op (BATCH:139); real dedup
    here is a documented divergence (SURVEY.md §5.3).
    """
    return project_user(dedup(df))
