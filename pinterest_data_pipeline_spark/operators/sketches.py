"""Frequency-sketch operators: Misra-Gries heavy hitters, count-min sketch.

The streaming/distributed classic for "top items without a full groupBy":
each partition maintains at most ``k`` counters (Misra & Gries 1982); the
per-partition summaries merge by per-item addition (Agarwal et al.,
"Mergeable Summaries", PODS 2012). The merged estimate underestimates the
true count by at most ``n/(k+1)`` (n = total rows), so every item with
true frequency above ``n/(k+1)`` is GUARANTEED present in the merged
summary — the candidate-superset property the certification query pins.

Why this exists next to an exact ``groupBy(item).count()``: at 100 TB with
a high-cardinality item domain (URLs, n-grams, user agents) the exact
aggregate shuffles one row per distinct item; the MG summary ships at most
``k`` rows per partition — constant-size map-side state, no skew exposure —
and the usual pattern is MG candidates -> one cheap exact-count semi-join
to finalize. Here the item pass itself is vectorized per Arrow batch
(pandas ``value_counts`` merged into the counter dict, then one
quantile-select decrement instead of row-at-a-time decrements), keeping
the Python path batch-shaped.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _shrink(counters: dict, k: int) -> None:
    """Reduce to <= k counters: subtract the (len-k)-th smallest count from
    every counter and drop the non-positive ones. Exactly k+1-or-more items
    lose that amount or die, so every unit of per-item decrement removes
    >= k+1 units of total weight — the invariant behind the n/(k+1) bound.
    """
    if len(counters) <= k:
        return
    counts = sorted(counters.values())
    v = counts[len(counters) - k - 1]
    for item in list(counters):
        nxt = counters[item] - v
        if nxt > 0:
            counters[item] = nxt
        else:
            del counters[item]


def _merge_batch(counters: dict, batch_counts, k: int) -> int:
    """Merge one Arrow batch's full ``value_counts`` into the counter dict,
    then prune ONCE — the Mergeable-Summaries merge step (union-add two
    summaries, one shrink back to <= k counters). Each shrink's per-item
    decrement still removes >= k+1 units of total weight, so the summed
    decrement — and hence the underestimate — stays <= n/(k+1) no matter
    how the stream is batched. Returns the number of shrink passes (0 or
    1), pinned by pytest so the per-item-insertion shrink regression
    cannot silently return.
    """
    for item, cnt in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(cnt)
    if len(counters) <= k:
        return 0
    _shrink(counters, k)
    return 1


def misra_gries_summary(df: DataFrame, item_col: str, k: int = 8) -> DataFrame:
    """Merged Misra-Gries summary: (item, est_count), at most k rows per
    input partition before the merge, estimates underestimating true
    counts by at most n/(k+1) in total.

    NULL items are ignored (they are not frequency candidates). The result
    is a candidate SUPERSET for heavy hitters: filter/verify with an exact
    count of just the candidates when exact values matter. The per-batch
    pass is vectorized: pandas ``value_counts`` merges into the dict in
    one sweep with a SINGLE sort-based shrink per batch (O(batch +
    k log k)), not one shrink per distinct item.
    """
    item_type = df.schema[item_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("item", item_type),
            T.StructField("est_count", T.LongType()),
        ]
    )

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            _merge_batch(counters, pdf[item_col].value_counts(dropna=True), k)
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "est_count": list(counters.values())}
            )

    partials = df.select(item_col).mapInPandas(summarize, schema=out_schema)
    return partials.groupBy("item").agg(F.sum("est_count").alias("est_count"))


# --- count-min sketch -------------------------------------------------------
#
# Cormode & Muthukrishnan 2005, expressed ENTIRELY as DataFrame relational
# algebra — no UDFs, no driver state. The sketch is a (depth x width) cell
# table built with one hash-partitioned aggregate; point estimates are the
# min over depth cells. Hashes are md5-derived (same uniform_hash family as
# sampling), so the construction is bit-reproducible in any engine and the
# estimates carry an EXACT SQL dual — no literal-TRUE invariant oracles.
#
# 100 TB posture: the cell table is depth*width rows no matter how many
# input rows feed it (partial aggregation does the compression map-side),
# it merges across corpora by cell-wise addition, and it broadcasts for
# the probe join. est >= exact always; est <= exact + 2n/width w.h.p.


def cms_bucket(c, row_idx: int, width: int, salt: str = "cms"):
    """Bucket of ``c`` in hash row ``row_idx``: md5-derived, engine-portable.

    DuckDB dual: ``CAST(('0x' || substring(md5(v::VARCHAR || salt || i), 1, 8))
    AS UBIGINT) % width``.
    """
    salted = F.concat(c.cast("string"), F.lit(salt), F.lit(str(row_idx)))
    h = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
    return (h % width).cast("int")


def cms_cells(
    df: DataFrame,
    item_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Count-min cell table: (row_idx, bucket, cell_count), <= depth*width rows.

    Each input row adds its weight (1 if ``weight_col`` is None) to one
    bucket per hash row. Compiles to explode + one hash aggregate whose
    grouping domain is depth*width cells — partial aggregation collapses
    the stream map-side, so the shuffle carries at most depth*width rows
    per task regardless of input size. Sketches over disjoint corpora
    merge by summing cell_count per (row_idx, bucket).
    """
    wcol = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row_idx"),
                    cms_bucket(F.col(item_col), i, width, salt).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    ).alias("cell")
    return (
        df.select(entries, wcol.alias("w"))
        .groupBy("cell.row_idx", "cell.bucket")
        .agg(F.sum("w").alias("cell_count"))
    )


def cms_point_estimates(
    probes: DataFrame,
    cells: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimate per probe item: min over its depth cells.

    The cell table is broadcast (it is <= depth*width rows by
    construction), so probing is a map-side join — no shuffle of the probe
    side beyond its own final aggregate.
    """
    keyed = probes.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_idx"),
                        cms_bucket(F.col(item_col), i, width, salt).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(item_col, "cell.row_idx", "cell.bucket")
    return (
        keyed.join(F.broadcast(cells), ["row_idx", "bucket"], "inner")
        .groupBy(item_col)
        .agg(F.min("cell_count").alias("cms_estimate"))
    )


# --- KMV (k-minimum-values) distinct sketch ---------------------------------
#
# Bar-Yossef et al. 2002 / Beyer et al. 2007: keep the k smallest hash
# values of the distinct items; the k-th smallest U_(k) estimates the
# distinct count as (k-1) / (U_(k) / 2^32). Sketches over arbitrary
# corpora MERGE by "union hashes, keep k smallest" — which also gives
# distinct counts of UNIONS without re-reading either side, the property
# HLL shares but with an exactly-reproducible integer construction: the
# hash is the repo's md5-derived uniform_hash, so sketch contents and the
# estimate are bit-identical in any engine (exact DuckDB dual, no bound
# oracle needed).
#
# 100 TB posture: orderBy(h).limit(k) compiles to TakeOrderedAndProject —
# per-partition k-heaps merged on the driver, no global sort, sketch size
# k rows forever.


def kmv_sketch(df: DataFrame, item_col: str, k: int = 64, salt: str = "kmv") -> DataFrame:
    """The k smallest md5-derived hash values over DISTINCT items: one
    column ``h`` (long in [0, 2^32)), at most k rows.

    NULL items are ignored (consistent with ``misra_gries_summary``) —
    load-bearing, not cosmetic: md5(NULL) is NULL in both engines, and
    an un-filtered NULL hash would sort FIRST in Spark's ascending order
    but LAST in DuckDB's, silently poisoning the k-smallest set with a
    cross-engine divergence.
    """
    salted = F.concat(F.col(item_col).cast("string"), F.lit(salt))
    h = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(h.alias("h"))
        .distinct()
        .orderBy(F.col("h").asc())
        .limit(k)
    )


def kmv_merge(*sketches: DataFrame, k: int = 64) -> DataFrame:
    """Union KMV sketches: distinct hashes, keep the k smallest — a valid
    KMV sketch of the UNION of the underlying sets."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.distinct().orderBy(F.col("h").asc()).limit(k)


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: one row, columns
    (n_sketch, kmv_estimate).

    If the sketch holds fewer than k hashes the set was smaller than k and
    the count is EXACT (= n_sketch); otherwise (k-1) * 2^32 / h_(k) — one
    float division from integers, rounded at this single site, so the
    value is reproducible cross-engine.
    """
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_sketch"), F.max("h").alias("h_k")
    )
    est = F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double")).otherwise(
        (F.lit(float(k - 1)) * F.lit(4294967296.0)) / F.col("h_k")
    )
    return agg.select("n_sketch", F.round(est, 4).alias("kmv_estimate"))
