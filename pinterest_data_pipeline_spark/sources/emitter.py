"""Envelope-file emitter: the local analogue of the reference's producers.

The reference pushes one JSON envelope per record over HTTP — Kafka REST
(``python_files/user_posting_emulation_uploader.py:74-124``) or Kinesis PUT
(``python_files/user_posting_emulation_streaming.py:76-120``). Here the
"wire" is a landing directory the streaming file source tails: one line per
record, ``{"StreamName": ..., "Data": "<json-encoded entity>", "PartitionKey"
: ...}``, sharded across several files per entity so a micro-batch has
multiple input splits.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterable


def envelope_line(entity: str, row: dict[str, Any]) -> str:
    """One wire record: entity payload JSON-encoded inside the envelope."""
    return json.dumps(
        {
            "StreamName": f"streaming-{entity}",
            "Data": json.dumps(row),
            "PartitionKey": str(row.get("index", "")),
        }
    )


def write_envelope_files(
    rows_by_entity: dict[str, Iterable[dict[str, Any]]],
    landing_dir: str,
    files_per_entity: int = 4,
) -> None:
    """Shard each entity's rows round-robin into landing files.

    Layout: ``<landing_dir>/<entity>/part-<i>.json``, matching what
    ``streaming.read_entity_stream`` tails. Files are written whole (no
    appends) because Structured Streaming file sources treat a file as an
    immutable, exactly-once unit.
    """
    for entity, rows in rows_by_entity.items():
        shards: list[list[str]] = [[] for _ in range(files_per_entity)]
        for i, row in enumerate(rows):
            shards[i % files_per_entity].append(envelope_line(entity, row))
        entity_dir = os.path.join(landing_dir, entity)
        os.makedirs(entity_dir, exist_ok=True)
        for i, lines in enumerate(shards):
            if lines:
                with open(os.path.join(entity_dir, f"part-{i}.json"), "w") as f:
                    f.write("\n".join(lines) + "\n")
