"""Distributed exact ranking without a data-sized single-task sort.

The naive exact rank — ``row_number() OVER (ORDER BY value)`` or a
per-key variant whose key cardinality is small — funnels every row of a
partition through one task (the scale wall VERDICT r9 flagged on the
weighted median). ``two_phase_rank`` splits it:

1. rows hash into coarse BUCKETS of the sort key (a value-range or
   key-prefix expression whose occupied-bucket count is bounded by the
   VALUE DOMAIN — cents ranges, 2-char prefixes — not the data);
2. per-(partition, bucket) counts roll up and a window over that SMALL
   rollup turns them into bucket rank offsets;
3. ``row_number`` runs partitioned per (partition, bucket), and the
   global rank is ``offset + in-bucket row number``.

Phase-2's window is the only unpartitioned (or key-partitioned) sort and
it touches one row per occupied bucket. Residual skew is bounded by the
largest single bucket, tunable via the bucket expression's granularity.

Used by ``agg_gini_customer_revenue`` (value-range buckets) and
``dedup_sorted_neighborhood`` (key-prefix buckets); scale evidence in
NOTES.md (gini 5.2x, sorted_neighborhood 7.2x wall at 64x data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_phase_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str],
    partition_cols: list[str] | None = None,
    rank_col: str = "r",
) -> DataFrame:
    """Append a dense 1-based global rank computed in two phases.

    ``bucket`` must be monotone in the sort order: every value in bucket
    b sorts before every value in bucket b+1 (true for value-range
    divisions and sort-key prefixes). ``order_cols`` breaks ties within
    a bucket; include a unique id for a deterministic rank, or rely on
    rank-sum invariance (e.g. Gini's SUM(i*x)) when ties may permute.
    """
    part = list(partition_cols or [])
    b = df.withColumn("_bkt", bucket)
    per_b = b.groupBy(*part, "_bkt").agg(
        F.count(F.lit(1)).cast("long").alias("_n_b")
    )
    wb = (
        Window.partitionBy(*part) if part else Window.partitionBy()
    ).orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = per_b.withColumn(
        "_off", F.coalesce(F.sum("_n_b").over(wb), F.lit(0)).cast("long")
    ).select(*part, "_bkt", "_off")
    wi = Window.partitionBy(*part, "_bkt").orderBy(*order_cols)
    return (
        b.join(offs, part + ["_bkt"])
        .withColumn(rank_col, F.col("_off") + F.row_number().over(wi))
        .drop("_bkt", "_off", "_n_b")
    )
