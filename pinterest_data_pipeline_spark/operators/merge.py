"""Relational MERGE (upsert) — the engine-native Delta ``MERGE INTO``.

The reference's streaming sink appends to Delta tables
(``databricks_notebooks/pintrest_stream_data_transformation.py:201-220``);
the capability users reach for next on such tables is ``MERGE INTO``
(upsert: update matched keys, insert new ones, optionally delete). Delta
is absent here, so this implements merge as pure relational algebra over
DataFrames:

    result = (matched keys -> source row)           [WHEN MATCHED UPDATE]
           ∪ (target-only keys -> target row)       [no clause]
           ∪ (source-only keys -> source row)       [WHEN NOT MATCHED INSERT]

One full-outer shuffle join on the key — the irreducible cost of a merge
without file-level statistics. (Delta/Iceberg beat this only by pruning
untouched FILES via min-max stats; the per-row algebra is identical. Pair
with ``sources/layout.write_zordered`` clustering and the same pruning
applies to the rewrite set.)

Source rows must be unique per key (enforceable upstream with
``dedup.exact_dedup`` or a window); duplicate source keys would make the
merge nondeterministic, exactly as Delta's MERGE rejects them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_S = "__merge_src_"


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    insert: bool = True,
    delete_matched: bool = False,
) -> DataFrame:
    """Merge ``source`` into ``target`` on ``keys``; returns the new target.

    * matched (key in both): source values win (UPDATE); with
      ``delete_matched=True`` the row is dropped instead (DELETE).
    * target-only: row kept unchanged.
    * source-only: inserted when ``insert=True``, else dropped.

    ``source`` may carry any subset of target's non-key columns; columns it
    lacks keep the target's value on update and NULL on insert.
    """
    non_keys = [c for c in target.columns if c not in keys]
    src = source.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(f"{_S}{c}")
            for c in source.columns
            if c not in keys
        ],
        F.lit(True).alias(f"{_S}present"),
    )
    joined = target.withColumn("__tgt_present", F.lit(True)).join(
        src, on=keys, how="full_outer"
    )
    matched = F.col(f"{_S}present").isNotNull() & F.col("__tgt_present").isNotNull()
    src_only = F.col("__tgt_present").isNull()
    if delete_matched:
        joined = joined.filter(~matched)
    if not insert:
        joined = joined.filter(~src_only)

    def value_of(c: str):
        if f"{_S}{c}" in joined.columns:
            # source wins wherever a source row exists (update + insert)
            return F.when(
                F.col(f"{_S}present").isNotNull(), F.col(f"{_S}{c}")
            ).otherwise(F.col(c))
        return F.col(c)  # column absent from source: target value / NULL

    return joined.select(
        *[F.col(k) for k in keys], *[value_of(c).alias(c) for c in non_keys]
    )


def scd2_history(
    snapshots: DataFrame, key: str, ts_col: str, attr_cols: list[str]
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from versioned rows.

    Input: every observed version of each dimension row (key, ts, attrs) —
    e.g. the concatenation of daily snapshots or a CDC feed. Output: one
    validity interval per consecutive distinct version:
    ``(key, attrs…, valid_from, valid_to, is_current)`` with ``valid_to``
    NULL on the open (current) interval.

    Consecutive duplicate versions (attribute-identical re-observations)
    collapse into one interval — the window compares each row to its
    predecessor and keeps only change points. One shuffle on the key; the
    lead() that closes each interval reuses the same partitioning, so the
    whole operator is a single exchange.
    """
    w = Window.partitionBy(key).orderBy(ts_col)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(c).over(w)
        changed = changed | ~(
            F.col(c).eqNullSafe(prev)
        )
    first_row = F.lag(ts_col).over(w).isNull()
    change_points = snapshots.withColumn(
        "__is_change", first_row | changed
    ).filter(F.col("__is_change"))
    w2 = Window.partitionBy(key).orderBy(ts_col)
    return (
        change_points.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__is_change", ts_col)
    )


def scd2_asof(history: DataFrame, ts) -> DataFrame:
    """Point-in-time (AS OF) read over an SCD2 history: the state of
    every key at timestamp ``ts`` under the half-open interval contract
    ``[valid_from, valid_to)`` that :func:`scd2_history` emits — a key's
    new version takes effect AT its snapshot instant, and keys born
    after ``ts`` don't exist yet. This is the "time travel" query every
    history table exists to answer (feature-store training-set
    reconstruction, audit reads), and it is a pure filter: partition
    pruning and predicate pushdown reach the scan, no join, no window.
    """
    t = F.lit(ts)
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC between two full snapshots of a keyed table.

    Emits the change feed a downstream MERGE / incremental view consumes:
    one row per changed key with ``change_type`` in (insert, delete,
    update) plus ``old_<c>`` / ``new_<c>`` for every compared column;
    unchanged keys produce nothing. ``update`` uses null-safe comparison,
    so NULL -> value and value -> NULL transitions count as changes.

    The engine-native twin of Delta's CHANGE DATA FEED for sources that
    only hand you periodic full dumps (the common warehouse-export shape):
    one full-outer shuffle join on the key — the irreducible cost without
    file statistics, and exactly the cost MERGE itself pays.
    """
    compare = compare_cols or [
        c for c in old.columns if c not in keys and c in new.columns
    ]
    o = old.select(
        *keys,
        *[F.col(c).alias(f"old_{c}") for c in compare],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"new_{c}") for c in compare],
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, on=keys, how="full_outer")
    differs = F.lit(False)
    for c in compare:
        differs = differs | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[F.col(f"old_{c}") for c in compare],
            *[F.col(f"new_{c}") for c in compare],
        )
    )


def apply_changelog(
    changes: DataFrame,
    keys: list[str],
    op_col: str,
    order_cols: list[str],
    delete_op: str = "D",
) -> DataFrame:
    """Apply an ordered insert/update/delete changelog to produce the
    final table state: latest op per key wins; keys whose latest op is a
    delete vanish. The CDC-consumer twin of :func:`snapshot_diff` (which
    PRODUCES a change feed) — together they round-trip Debezium/CDC-shaped
    pipelines without Delta: replaying the feed through this operator must
    reproduce the source table.

    One window pass partitioned by key (rank in DESCENDING change order,
    keep rank 1) — Catalyst's WindowGroupLimit short-circuits rows past
    rank 1 before the sort buffers them, so per-key cost is O(changes of
    that key) with no unbounded state. ``n_changes`` (total ops applied
    per surviving key) rides the same partitioning as a window count —
    still the single key shuffle.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    w_all = Window.partitionBy(*keys)
    # n_changes BEFORE the rank: the rank window must sit directly under
    # the rank=1 filter or Catalyst cannot insert its WindowGroupLimit
    # short-circuit (plan-contract pinned by tests/test_round8_ops.py)
    return (
        changes.withColumn("n_changes", F.count(F.lit(1)).over(w_all).cast("long"))
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .drop("__rn")
    )
