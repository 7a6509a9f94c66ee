"""Structured Streaming analogues of the reference's batch-incremental loop.

The reference has no true streams (SURVEY.md §2.9) — it re-probes a rolling
window daily and UPSERTs. These are the streaming-shaped equivalents for a
deployment where probe results arrive continuously.
"""

from .pipeline import (
    availability_transitions,
    dedup_document_stream,
    dedup_probe_stream,
    document_stream_source,
    probe_stream_source,
    start_upsert_sink,
    streaming_symbol_counts,
)

__all__ = [
    "availability_transitions",
    "dedup_document_stream",
    "dedup_probe_stream",
    "document_stream_source",
    "probe_stream_source",
    "start_upsert_sink",
    "streaming_symbol_counts",
]
