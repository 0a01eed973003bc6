"""Structured Streaming surface: source parse, watermarked dedup, sinks.

Reproduces the reference's streaming pipeline (source -> CAST -> from_json ->
flatten -> clean -> append sink + checkpoint, reference
``databricks_notebooks/pintrest_stream_data_transformation.py:45-232``) on
open Spark primitives, and extends it with the watermarked event-time
operators the reference lacks (SURVEY.md §2.9).
"""

from .pipeline import (  # noqa: F401
    attributed_conversions,
    corrupt_records,
    enrich_stream,
    parse_envelope_stream,
    read_entity_stream,
    run_streaming_pipeline,
    session_event_counts,
    stream_clean_entity,
    upsert_sink,
    watermarked_dedup,
    windowed_event_counts,
    write_entity_stream,
)
