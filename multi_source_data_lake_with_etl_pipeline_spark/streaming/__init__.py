"""Structured Streaming layer (SURVEY.md §2.10)."""

from .ingest import (  # noqa: F401
    read_events_stream,
    run_to_memory_sink,
    stream_dedup,
    stream_session_agg,
    stream_tumbling_agg,
    write_stream_parquet,
)
