"""Skew-mitigation utilities: two-phase salted aggregation, salted join.

First line of defense at scale is AQE (`spark.sql.adaptive.skewJoin` — on in
`session.get_spark`), which splits oversized shuffle partitions at runtime.
These utilities cover the cases AQE cannot fix:

* **Aggregation skew** — AQE's skew handling applies to joins, not
  aggregations. A single hot group key (one language, one empty-string
  document) funnels its entire partition through one reducer.
  ``salted_aggregate`` splits each group into ``n_salts`` subgroups for the
  partial aggregate (spreading the hot key over n reducers), then combines
  the partials in a second, tiny aggregate — the classic two-phase rewrite,
  valid for any algebraic aggregate (sum/count/min/max).
* **Join skew with a replicable side** — ``salted_join`` salts the big
  side's key and replicates the small side across all salt values. Unlike a
  broadcast join it keeps the small side shuffled (for when it is too big to
  broadcast but small enough to replicate n_salts×).

The salt is ``pmod(xxhash64(whole row), n)`` — deterministic (no RNG on
executors, stable under retries/speculation) and uniform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: partial over (keys + salt), final over keys.

    ``aggs`` maps output column -> (input column or '*', fn) with fn in
    {count, sum, min, max}. The combine function for count is sum; for the
    rest it is the function itself (all are semigroups).
    """
    partial_fns = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    combine_fns = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn("_salt", _row_salt(df, n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            partial_fns[fn](F.lit(1) if col == "*" else F.col(col)).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[combine_fns[fn](F.col(out)).alias(out) for out, (col, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: tuple[str, str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    The join key becomes (key, salt): the hot key's rows scatter across
    ``n_salts`` reducers instead of one. The small side is exploded
    ``n_salts``× — use only when that blowup is acceptable and the small
    side exceeds the broadcast threshold.
    """
    bk, sk = on
    big_s = big.withColumn("_salt", _row_salt(big, n_salts))
    small_r = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        big_s.join(small_r, (big_s[bk] == small_r[sk]) & (big_s["_salt"] == small_r["_salt"]), how)
        .drop(small_r[sk])
        .drop("_salt")
    )
