"""Bucketed-table helpers: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides. Bucketing spends that shuffle ONCE at write time: both tables hashed
into the same number of buckets on the join key mean every subsequent join
(and groupBy on the key) reads co-located buckets and skips the exchange
entirely — the plan is Scan -> Sort -> SortMergeJoin with no
ShuffleExchange. ``sortBy`` on the bucket key additionally lets the merge
skip its sort at read when bucket files are single-split.

The reference has no bucketing (nothing at its scale needed it, SURVEY.md
§4.1); this is the documented 100 TB posture for the `ind`-keyed entity
joins and any repeated fact-fact join.
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 64,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Drops any previous table AND its leftover warehouse directory first: the
    in-memory catalog forgets tables between sessions while their managed
    locations survive on disk, and saveAsTable refuses to reuse an orphaned
    location.
    """
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)

    writer = df.write.bucketBy(buckets, key).mode("overwrite")
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def compact_json_landing(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    schema,
    target_mb: int = 128,
) -> int:
    """Compact a many-small-files JSON landing zone into sized parquet.

    The reference's Kafka→S3 sink writes ONE file per record
    (``flush.size=1``, ``implementation_details.md:71``) — at 100 TB that is
    billions of S3 objects and a scan dominated by open/close overhead.
    Compaction rewrites the zone as parquet with one file per
    ``target_mb`` of input, sized so a scan task gets one well-filled
    split. Returns the number of output files.
    """
    df = spark.read.schema(schema).json(src_dir)
    n_bytes = sum(f.stat().st_size for f in Path(src_dir).rglob("*") if f.is_file())
    n_files = max(1, math.ceil(n_bytes / (target_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    return n_files


def cobucket_for_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    names: tuple[str, str],
    buckets: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Write both sides bucketed on their join keys with the same bucket
    count and return the (re-read) co-located tables."""
    write_bucketed(left, names[0], left_key, buckets)
    write_bucketed(right, names[1], right_key, buckets)
    return spark.table(names[0]), spark.table(names[1])
