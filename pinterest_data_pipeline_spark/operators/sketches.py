"""Frequency-sketch operators: Misra-Gries heavy hitters.

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


def misra_gries_summary(df: DataFrame, item_col: str, k: int = 8) -> DataFrame:
    """Merged Misra-Gries summary: (item, est_count), at most k rows per
    input partition before the merge, estimates underestimating true
    counts by at most n/(k+1) in total.

    NULL items are ignored (they are not frequency candidates). The result
    is a candidate SUPERSET for heavy hitters: filter/verify with an exact
    count of just the candidates when exact values matter.
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
            for item, cnt in pdf[item_col].value_counts(dropna=True).items():
                counters[item] = counters.get(item, 0) + int(cnt)
                _shrink(counters, k)
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "est_count": list(counters.values())}
            )

    partials = df.select(item_col).mapInPandas(summarize, schema=out_schema)
    return partials.groupBy("item").agg(F.sum("est_count").alias("est_count"))
