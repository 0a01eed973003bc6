"""Sequence packing and chunking for LLM training-data preparation.

The reference pipeline stops at cleaned per-record tables
(``databricks_notebooks/pintrest_batch_data_transformation.py``); these
operators extend it with the two layout steps a training pipeline runs after
curation: packing documents into fixed token-budget context windows and
splitting documents into overlapping retrieval chunks.

Both are pure DataFrame plans. Packing needs a global prefix sum — the one
operation that naively serializes (a single global window sort) — so it is
implemented as the classic two-phase distributed scan:

1. assign each row to a contiguous block by its order key (pure arithmetic,
   no shuffle),
2. aggregate per-block totals (tiny: ``n_blocks`` rows) and turn them into
   exclusive block offsets on the driver,
3. run the running sum per block (windows partitioned by block sort in
   parallel) and add the broadcast block offset.

At 100 TB the only shuffle is the per-block hash exchange, every block's
window sort runs on its own executor, and the driver handles ``n_blocks``
integers — versus the naive ``Window.orderBy(order_col)`` plan that drags
the whole table through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    size_col: str,
    order_col: str,
    budget: int,
    n_blocks: int = 64,
) -> DataFrame:
    """Greedy sequential packing: records are concatenated in ``order_col``
    order and split into fixed ``budget``-sized bins; each record lands at
    ``bin_id = cum_before // budget``, ``bin_offset = cum_before % budget``
    where ``cum_before`` is the exclusive prefix sum of ``size_col``.

    This is the GPT-style concat-and-split layout (a record may straddle a
    bin boundary; ``bin_id`` is where it starts). The result is independent
    of ``n_blocks`` — blocks only parallelize the prefix sum — so size it to
    the cluster, not the data.
    """
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    span = max(int(hi) - int(lo) + 1, 1)
    blk = F.floor(
        (F.col(order_col) - F.lit(int(lo))) * F.lit(n_blocks) / F.lit(span)
    ).cast("int")
    blocked = df.withColumn("_blk", blk)
    totals = blocked.groupBy("_blk").agg(F.sum(size_col).alias("_tot")).collect()
    offsets, running = {}, 0
    for row in sorted(totals, key=lambda r: r["_blk"]):
        offsets[row["_blk"]] = running
        running += int(row["_tot"])
    off = F.create_map(
        *[F.lit(x) for k in sorted(offsets) for x in (k, offsets[k])]
    )
    w = (
        Window.partitionBy("_blk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = (
        F.coalesce(F.sum(size_col).over(w), F.lit(0)) + off[F.col("_blk")]
    ).cast("long")
    return blocked.select(
        order_col,
        F.col(size_col).cast("long").alias(size_col),
        F.floor(cum_before / budget).cast("long").alias("bin_id"),
        (cum_before % budget).cast("long").alias("bin_offset"),
    )


def chunk_sliding(
    df: DataFrame,
    text_col: str,
    id_col: str,
    size: int,
    stride: int,
) -> DataFrame:
    """Overlapping character chunks (RAG-style retrieval windows).

    ``sequence`` + ``explode`` generate the chunk starts JVM-side, so the
    fan-out never leaves codegen; each output row carries the chunk's start
    offset, realized length, and content digest (the digest keeps driver
    comparisons and downstream exact-dedup cheap — the chunk text itself is
    reconstructable from (id, start, size)).
    """
    starts = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.length(text_col) - 1, F.lit(0)),
            F.lit(stride),
        )
    ).alias("chunk_start")
    chunk = F.expr(f"substring({text_col}, chunk_start + 1, {size})")
    return (
        df.filter(F.length(text_col) > 0)
        .select(F.col(id_col), F.col(text_col), starts)
        .select(
            id_col,
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )
