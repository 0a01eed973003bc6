"""Join operators beyond plain equi-joins: as-of and range joins.

The reference contains only inner equi-joins on a single key (SURVEY.md
§2.3); these are extension operators a training-data pipeline needs for
point-in-time feature lookup (as-of) and interval containment (range).

Both are built from DataFrame primitives so Catalyst plans them:

* **as-of** uses the union + per-key window formulation — ONE shuffle+sort
  on the join key, O(left+right) state — instead of the naive
  inequality-join + groupBy, whose candidate set explodes with key frequency
  (every left row × every earlier right row). At 100 TB the union form's
  sort-merge is the same machinery as a sort-merge join; nothing is
  quadratic.
* **range** composes an equi-key with interval predicates so Catalyst plans
  a hash/sort-merge join on the equi part and post-filters the band — the
  planner-friendly shape (a pure theta band join degenerates to
  nested-loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: tuple[str, str],
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the nearest right row per key.

    ``direction="backward"`` (default): greatest right ``on`` <= left ``on``
    (point-in-time feature lookup). ``direction="forward"``: smallest right
    ``on`` >= left ``on`` (next-event attribution). Equality matches in
    both directions, like DuckDB's ASOF JOIN with >= / <=.

    ``on``: ordering column name present in both sides (comparable types).
    ``by``: (left_key, right_key) equi-key pair.
    ``value_cols``: right-side columns carried onto left rows (suffixed).

    Right rows must be unique per (key, on) — pre-aggregate otherwise; that
    restriction is what makes the result deterministic (and matches DuckDB's
    ASOF JOIN for the oracle).

    Implementation: tag sides, union, ONE window per key — the side sort
    key places right rows on the matching side of equal-``on`` left rows,
    and ``last``/``first`` with ignorenulls carries the nearest right
    values onto each left row. One shuffle+sort on the key, O(left+right)
    state — never the quadratic inequality-join + groupBy.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    lk, rk = by
    l_tagged = left.select(
        F.col(lk).alias("_key"),
        F.col(on).alias("_on"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_rv_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(rk).alias("_key"),
        F.col(on).alias("_on"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_left"].dataType).alias("_left"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    if direction == "backward":
        # right rows sort before equal-on left rows; scan looks backward
        w = (
            Window.partitionBy("_key")
            .orderBy(F.asc("_on"), F.asc("_side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        # right rows sort after equal-on left rows; scan looks forward
        w = (
            Window.partitionBy("_key")
            .orderBy(F.asc("_on"), F.desc("_side"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    filled = l_tagged.unionByName(r_tagged).select(
        "_side",
        "_left",
        *[fill(f"_rv_{c}").over(w).alias(f"_rv_{c}") for c in value_cols],
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rv_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: tuple[str, str],
    point: str,
    lower: str,
    upper: str,
) -> DataFrame:
    """Interval-containment join: equi-key match AND lower <= point <= upper.

    The equi component keeps the physical plan a hash/sort-merge join; the
    band predicates evaluate as join filters. Columns from both sides are
    kept (right's equi key dropped as redundant).
    """
    lk, rk = equi
    joined = left.join(
        right,
        (left[lk] == right[rk])
        & (left[point] >= right[lower])
        & (left[point] <= right[upper]),
    )
    return joined.drop(right[rk])


def fuzzy_self_join(
    df: DataFrame, text_col: str, max_distance: int = 2
) -> DataFrame:
    """Edit-distance self-join with length blocking (entity resolution).

    All pairs of distinct values within ``max_distance`` edits. Naively
    O(n²); the blocking exploits |len(a) - len(b)| <= edit_distance: side A
    keys on its length bucket (width d+1), side B explodes to its bucket ±1,
    so every qualifying pair meets in some bucket (equi-join shuffle) while
    the candidate set stays near-linear for realistic length histograms.
    The exact ``levenshtein`` verify runs only on bucket collisions —
    LSH-for-edit-distance in two lines of relational algebra.
    """
    width = max_distance + 1
    vals = df.select(F.col(text_col).alias("val")).distinct()
    a = vals.select(
        "val", (F.length("val") / width).cast("int").alias("bucket")
    ).withColumnRenamed("val", "val_a")
    b = vals.select(
        F.col("val").alias("val_b"),
        F.explode(
            F.array(
                *[
                    ((F.length("val") / width).cast("int") + i)
                    for i in (-1, 0, 1)
                ]
            )
        ).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("val_a") < F.col("val_b"))
        .withColumn("edit_distance", F.levenshtein("val_a", "val_b"))
        .filter(F.col("edit_distance") <= max_distance)
        .select("val_a", "val_b", "edit_distance")
        .distinct()
    )


def deletion_neighborhood_join(df: DataFrame, text_col: str) -> DataFrame:
    """EXACT edit-distance-1 self-join via deletion neighborhoods (FastSS,
    Bocek et al. 2007) — the scale-correct twin of
    :func:`fuzzy_self_join`'s length blocking: instead of colliding every
    similar-LENGTH pair, a pair becomes a candidate only when an actual
    single-deletion variant matches, so candidate volume tracks true
    near-matches, not the length histogram.

    Index every distinct value under itself plus its |s| single-deletion
    variants. Completeness for d(a,b) <= 1 is structural: insertion means
    a is a deletion variant of b (shared key a); deletion is symmetric;
    substitution at position i means deleting i from BOTH yields the same
    string (shared variant). The ``levenshtein <= 1`` verify removes the
    false positives (distinct variants can collide, e.g. transposition-
    adjacent strings), so the output is exact.

    100 TB shape: explode fan-out is |s|+1 keys per value; one equi-join
    shuffle keyed on the variants; verification touches candidates only.
    Generalizes to d <= k with k-deletion neighborhoods (fan-out C(|s|,k))
    — k=1 here, the common spelling-variant/SKU-typo resolution case.
    """
    vals = df.select(F.col(text_col).alias("val")).distinct()
    dels = F.expr(
        "transform(sequence(1, length(val)), "
        "i -> concat(substring(val, 1, i - 1), "
        "substring(val, i + 1, length(val))))"
    )
    keyed = vals.select(
        "val",
        F.explode(
            F.concat(F.array(F.col("val")), dels)
        ).alias("k"),
    ).distinct()
    a = keyed.select(F.col("val").alias("val_a"), "k")
    b = keyed.select(F.col("val").alias("val_b"), "k")
    return (
        a.join(b, "k")
        .filter(F.col("val_a") < F.col("val_b"))
        .select("val_a", "val_b")
        .distinct()
        .withColumn("edit_distance", F.levenshtein("val_a", "val_b"))
        .filter(F.col("edit_distance") <= 1)
    )


def grid_neighbor_pairs(
    pts: DataFrame,
    cell: int,
    threshold2: int | None = None,
    key_col: str = "key",
    x_col: str = "lat_i",
    y_col: str = "lon_i",
) -> DataFrame:
    """All point pairs within sqrt(threshold2) by integer grid blocking.

    ``pts`` carries integer coordinates; cells are ``coord div cell`` and
    candidates come from equi-joining each point's 3x3 neighbor cells —
    LOSSLESS whenever ``cell**2 >= threshold2`` (a qualifying pair can
    never straddle non-adjacent cells), asserted here. Returns
    (key_a, key_b, dist2) with key_a < key_b, dist2 exact int64.

    Scale: candidate volume is sum over cells of occupancy * its 3x3
    neighborhood — bounded by DENSITY, not corpus size, when the domain
    grows with the data. The adversary is a HOT CELL (a dense city): a
    cell holding k points contributes O(k^2) candidates regardless of
    the threshold filter. Mitigation is resolution, not salting: halve
    ``cell`` (still >= sqrt(threshold2)) until occupancy is bounded, or
    split hot cells recursively (quadtree) — candidates stay exact
    either way because losslessness only needs cell >= threshold.
    """
    from pyspark.sql import functions as F

    if threshold2 is None:
        threshold2 = cell * cell
    # losslessness contract — explicit raise so it survives `python -O`
    if not cell * cell >= threshold2:
        raise ValueError(
            "grid blocking is lossless only when cell size covers the "
            f"threshold: cell^2={cell * cell} < threshold2={threshold2}"
        )
    cells = pts.select(
        F.col(key_col).alias("key"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
        F.floor(F.col(x_col) / cell).cast("long").alias("cx"),
        F.floor(F.col(y_col) / cell).cast("long").alias("cy"),
    )
    # 3x3 probe fan-out via explode (Generate), never a small-frame
    # crossJoin — the no-BNLJ plan discipline (rolling-WAU precedent)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probes = cells.select(
        F.col("key").alias("key_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        "cx",
        "cy",
        F.explode(offsets).alias("o"),
    ).select(
        "key_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("pcx"),
        (F.col("cy") + F.col("o.dy")).alias("pcy"),
    )
    return (
        probes.join(
            cells.select(
                F.col("key").alias("key_b"),
                F.col("x").alias("xb"),
                F.col("y").alias("yb"),
                "cx",
                "cy",
            ),
            (F.col("pcx") == F.col("cx"))
            & (F.col("pcy") == F.col("cy"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .select(
            "key_a",
            "key_b",
            (
                (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
                + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            ).alias("dist2"),
        )
        .filter(F.col("dist2") <= threshold2)
    )
