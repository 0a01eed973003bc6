"""Custom Python Data Source (Spark 4 API): the posting-emulator as a format.

The reference extracts rows by polling MySQL from a single-process emulator
(``python_files/user_posting_emulation_uploader.py:49-72``). Spark 4's
Python Data Source API lets that extract side become a first-class,
PARTITION-PARALLEL source the engine plans like any other scan:

    spark.dataSource.register(PostingEmulatorDataSource)
    df = (spark.read.format("posting_emulator")
          .option("entity", "pin").option("rows", 10_000)
          .option("partitions", 8).load())

Each input partition generates its slice independently from a
partition-derived seed — no shared RNG, no driver bottleneck, linear
scale-out with the partition count — while producing the same dirty-data
patterns (sentinels, k/M suffixes, duplicates) the cleaning operators are
tested on. Determinism contract: (rows, seed, partitions) fixes the full
output multiset; per-partition slices are independent of executor
placement.

This is the engine's answer to SURVEY.md §2.1 S10 as a *connector* rather
than a fixture helper: the same class shape (DataSource / reader /
partitions) is how a real Kafka-REST or JDBC-sampler source would plug in.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import GEO_RAW_SCHEMA, PIN_RAW_SCHEMA, USER_RAW_SCHEMA
from .generator import make_raw_entities

_SCHEMAS = {"pin": PIN_RAW_SCHEMA, "geo": GEO_RAW_SCHEMA, "user": USER_RAW_SCHEMA}
_ENTITY_SLOT = {"pin": 0, "geo": 1, "user": 2}


class _SlicePartition(InputPartition):
    def __init__(self, index: int, n_rows: int, seed: int, row_offset: int):
        self.index = index
        self.n_rows = n_rows
        self.seed = seed
        self.row_offset = row_offset


class PostingEmulatorReader(DataSourceReader):
    def __init__(self, options: dict):
        self.entity = options.get("entity", "pin")
        if self.entity not in _SCHEMAS:
            raise ValueError(f"unknown entity {self.entity!r}; use pin|geo|user")
        self.rows = int(options.get("rows", 1000))
        self.seed = int(options.get("seed", 42))
        self.n_partitions = max(1, int(options.get("partitions", 4)))
        # planted full-row duplicates (the generator's dedup-test pattern);
        # 0 by default so `rows` is the exact output cardinality
        self.dup_frac = float(options.get("dup_frac", 0.0))

    def partitions(self) -> list[InputPartition]:
        base, rem = divmod(self.rows, self.n_partitions)
        parts = []
        offset = 0
        for i in range(self.n_partitions):
            n = base + (1 if i < rem else 0)
            parts.append(_SlicePartition(i, n, self.seed + 7919 * i, offset))
            offset += n
        return parts

    def read(self, partition: _SlicePartition) -> Iterator[tuple]:
        """Generate this partition's slice only — runs ON THE EXECUTOR."""
        triplet = make_raw_entities(
            n=partition.n_rows, seed=partition.seed, dup_frac=self.dup_frac
        )
        rows = triplet[_ENTITY_SLOT[self.entity]]
        fields = [f.name for f in _SCHEMAS[self.entity].fields]
        for r in rows:
            # re-base the per-partition 0..n index onto the global row range
            # so `index` stays the 1:1 cross-entity key
            r = dict(r)
            r["index"] = r["index"] + partition.row_offset
            yield tuple(r[f] for f in fields)


class PostingEmulatorDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "posting_emulator"

    def schema(self):
        return _SCHEMAS[self.options.get("entity", "pin")]

    def reader(self, schema) -> PostingEmulatorReader:
        return PostingEmulatorReader(dict(self.options))

    def streamReader(self, schema) -> "PostingEmulatorStreamReader":
        return PostingEmulatorStreamReader(dict(self.options))


# --- streaming flavor --------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class PostingEmulatorStreamReader(DataSourceStreamReader):
    """Offset-based micro-batch stream of emulator rows.

    Mirrors the reference's continuous emitter
    (``python_files/user_posting_emulation_streaming.py:47-70``) as a real
    Structured Streaming source: the driver-side reader advances a row-count
    offset by ``rows_per_batch`` per trigger (capped at ``max_rows`` when
    set, so finite drains terminate); executors generate each batch's slice
    from offset-derived seeds. Offsets are plain row indices — replayable:
    re-reading [start, end) after a crash regenerates identical rows, which
    is exactly the contract checkpoint recovery needs from a source.
    """

    def __init__(self, options: dict):
        self.entity = options.get("entity", "pin")
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 0))  # 0 = unbounded
        self._cur = 0
        self._committed = 0  # highest offset the engine has committed

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # Advance from wherever the committed stream actually is: after a
        # checkpoint restart this reader is rebuilt with _cur = 0 while the
        # recovered start offset may be far ahead — without the max() the
        # counter would lag behind the checkpoint and the n <= 0 guard in
        # partitions() would emit empty micro-batches until it caught up.
        self._cur = max(self._cur, self._committed) + self.rows_per_batch
        if self.max_rows:
            self._cur = min(self._cur, self.max_rows)
        return {"index": self._cur}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["index"], end["index"]
        # A recovered stream replays its pending batch before any commit()
        # fires; the replayed range is already in the engine's offset log
        # (that is why it is being replayed), so its end is the true floor
        # for the next latestOffset — resume immediately, no silent stall.
        self._committed = max(self._committed, hi)
        n = hi - lo
        if n <= 0:
            return []
        n_parts = min(4, n)
        base, rem = divmod(n, n_parts)
        parts, off = [], lo
        for i in range(n_parts):
            size = base + (1 if i < rem else 0)
            parts.append(_SlicePartition(i, size, self.seed + off, off))
            off += size
        return parts

    def read(self, partition: _SlicePartition) -> Iterator[tuple]:
        triplet = make_raw_entities(n=partition.n_rows, seed=partition.seed, dup_frac=0.0)
        rows = triplet[_ENTITY_SLOT[self.entity]]
        fields = [f.name for f in _SCHEMAS[self.entity].fields]
        for r in rows:
            r = dict(r)
            r["index"] = r["index"] + partition.row_offset
            yield tuple(r[f] for f in fields)

    def commit(self, end: dict) -> None:
        self._committed = max(self._committed, end["index"])
