"""Spark 4 ``transformWithStateInPandas`` twin of ``stateful.running_user_totals``.

``applyInPandasWithState`` (stateful.py) is the Spark 3.x escape hatch; Spark 4
ships a successor — ``transformWithStateInPandas`` with a ``StatefulProcessor``
lifecycle object — that fixes its operational weak spots, which is why the
engine carries both:

* **Typed, named state slots** (``getValueState``/``getListState``/
  ``getMapState``) instead of one opaque tuple — state schema can evolve.
* **Timers decoupled from the batch loop**: event-time/processing-time timers
  fire per key without the ProcessingTimeTimeout quirk that keeps
  ``availableNow`` drains from ever quiescing (NOTES.md) — ``timeMode="None"``
  here makes finite drains clean.
* **RocksDB state store required** — the disk-spillable store is the 100 TB
  posture for state that exceeds executor heap.

Semantics here are identical to the v1 operator (per-user running count+sum,
update-mode emission), so the parity test can diff the two implementations
batch-for-batch.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# transformWithState only runs on the RocksDB state store (the JVM provider is
# bundled with Spark; no extra install). Set before starting the query.
ROCKSDB_PROVIDER_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
}


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, sum) in a named ValueState slot."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self,
        key: Tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timer_values: Any,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        total = round(total, 6)
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [uid], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_v2(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-user running (count, sum) across micro-batches — Spark 4 API.

    The caller must run on a session with ``ROCKSDB_PROVIDER_CONF`` applied
    (``spark.conf.set`` before the query starts is enough).
    """
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
