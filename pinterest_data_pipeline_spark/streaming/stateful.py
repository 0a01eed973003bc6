"""Custom stateful streaming operators via Arrow-batched per-key state.

For semantics the built-in stateful operators (windowed agg, session
window, dropDuplicatesWithinWatermark) cannot express, Structured
Streaming's escape hatch is ``applyInPandasWithState``: per-key state the
operator updates from whole Arrow batches, with timeout-driven eviction.
This module uses it for a running per-user engagement accumulator — totals
that persist across micro-batches (and restarts, via the checkpoint) and
evict after idleness, a shape no built-in window covers because the
lifetime is data-dependent, not time-bucketed.

State discipline for 100 TB streams: state is keyed (hash-partitioned by
user), value is O(1) per key (two numbers), and every key carries a
timeout so the store cannot grow without bound — the same bounded-state
rule the watermarked dedup enforces (SURVEY.md §2.9 T2).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    pass

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("evicted", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def running_user_totals(
    events: DataFrame,
    idle_timeout_ms: int | None = None,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running (count, sum) maintained across micro-batches.

    Emits the updated totals for every user seen in a batch (update mode).
    With ``idle_timeout_ms`` set, a user idle past the limit is emitted one
    final time with ``evicted=True`` and the state removed — the bounded-
    state production posture. Caveat: a processing-time timeout keeps the
    micro-batch loop ticking to fire evictions, so drain-and-stop triggers
    (``availableNow`` / ``processAllAvailable``) never see the query go
    quiescent — use it with a real processing-time trigger; tests and
    finite backfills run with ``None`` (no timeout).
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [uid], "n_events": [n], "total_value": [total], "evicted": [True]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, round(total, 6)))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [uid], "n_events": [n], "total_value": [round(total, 6)], "evicted": [False]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        update, RUNNING_TOTALS_SCHEMA, _STATE_SCHEMA, "update", timeout
    )


# --- ordered funnel (view -> click -> purchase) -----------------------------

FUNNEL_TIMES_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("t_view", T.TimestampType()),
        T.StructField("t_click", T.TimestampType()),
        T.StructField("t_purchase", T.TimestampType()),
    ]
)

# epoch nanos with -1 as "not reached": integer state round-trips exactly
# and keeps the per-key footprint at three longs
_FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t_view_ns", T.LongType()),
        T.StructField("t_click_ns", T.LongType()),
        T.StructField("t_purchase_ns", T.LongType()),
    ]
)


def funnel_first_times(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of the batch ordered funnel (plans/relational.py
    ``events_funnel_steps``): per user, first ``steps[0]`` time, first
    ``steps[1]`` strictly after it, first ``steps[2]`` strictly after
    that — maintained incrementally across micro-batches in O(1) state per
    user (three epoch-nano longs).

    PRECONDITION: micro-batches must arrive in event-time order ACROSS
    batches (the log-ingestion norm: files land in time order); in-batch
    order is restored by a per-key sort, so only cross-batch reordering
    matters. Under that ordering the greedy state update is exactly the
    batch conditional-min formulation, strict inequalities included. Late
    (out-of-order) data would need the buffered-finalize variant — buffer
    events in state, finalize per watermark advance — which trades state
    size for reordering tolerance; this operator takes the O(1)-state side
    of that trade and documents it.

    Emits the current (t_view, t_click, t_purchase) per user seen in the
    batch (update mode); fields are monotone — set once, never changed —
    so a keyed upsert sink converges to the final funnel table.
    """
    first_step, second_step, third_step = steps

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        tv, tc, tp = state.get if state.exists else (-1, -1, -1)
        rows = pd.concat([pdf[[ts_col, type_col]] for pdf in pdfs])
        rows = rows.sort_values(ts_col, kind="mergesort")
        for ts, et in zip(rows[ts_col], rows[type_col]):
            if tp >= 0:
                break
            t = pd.Timestamp(ts).value
            if tv < 0:
                if et == first_step:
                    tv = t
            elif tc < 0:
                if et == second_step and t > tv:
                    tc = t
            elif et == third_step and t > tc:
                tp = t
        state.update((tv, tc, tp))

        def as_ts(v: int):
            return pd.Timestamp(v) if v >= 0 else pd.NaT

        yield pd.DataFrame(
            {
                "user_id": [uid],
                "t_view": [as_ts(tv)],
                "t_click": [as_ts(tc)],
                "t_purchase": [as_ts(tp)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        FUNNEL_TIMES_SCHEMA,
        _FUNNEL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --- per-day t-digest quantile monitoring -----------------------------------

TDIGEST_DAILY_SCHEMA = T.StructType(
    [
        T.StructField("day", T.DateType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("p50", T.DoubleType()),
        T.StructField("p95", T.DoubleType()),
    ]
)

# centroid arrays round-trip exactly through the state store; the digest's
# <= ~2*delta budget bounds the per-key footprint at a few hundred doubles
# no matter how many values the day has seen
_TDIGEST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("means", T.ArrayType(T.DoubleType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
    ]
)


def daily_quantile_digests(
    events: DataFrame, value_col: str = "value", delta: float = 100.0
) -> DataFrame:
    """Per-day quantile monitoring as CUSTOM stateful streaming: each day
    key holds a t-digest (centroid arrays) in the state store, every
    micro-batch folds its values in with one compress, and the updated
    (n, p50, p95) row is emitted in update mode — the latency-percentile
    dashboard shape, maintained incrementally instead of recomputed.

    This is the sketch the built-in streaming aggregates cannot express
    (percentiles aren't algebraic), which is exactly what
    ``applyInPandasWithState`` exists for: per-key state Spark
    checkpoints and restores, with arbitrary Python logic per batch. The
    per-key state is <= ~2*delta centroids by the digest's construction
    — bounded for an unbounded stream, same posture as the CMS rollup's
    1024 cells. Estimates depend on batch-fold order (t-digest merges
    are rank-error-stable, not bit-stable), so certification is in RANK
    space against exact per-day quantiles, never on the floats.
    """
    from ..operators.sketches import tdigest_compress, tdigest_quantile

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (day,) = key
        if state.exists:
            means, weights = state.get
            pairs = list(zip(means, weights))
        else:
            pairs = []
        for pdf in pdfs:
            pairs.extend((float(v), 1.0) for v in pdf[value_col].dropna())
        digest = tdigest_compress(pairs, delta)
        state.update(
            ([m for m, _ in digest], [w for _, w in digest])
        )
        yield pd.DataFrame(
            {
                "day": [day],
                "n_values": [int(round(sum(w for _, w in digest)))],
                "p50": [tdigest_quantile(digest, 0.5)],
                "p95": [tdigest_quantile(digest, 0.95)],
            }
        )

    return events.groupBy("day").applyInPandasWithState(
        update,
        TDIGEST_DAILY_SCHEMA,
        _TDIGEST_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
