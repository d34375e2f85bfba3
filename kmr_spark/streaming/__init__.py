"""Structured Streaming extensions (beyond reference parity).

KMR has no streaming model (SURVEY.md §2.11 — the PUSHOFF KVS is
communication overlap inside one bulk-synchronous step, not a stream).
These operators extend the engine to unbounded event streams with
event-time semantics: tumbling/sliding/session windows, watermarked
late-data handling, and streaming dedup — each the streaming twin of a
batch query in kmr_spark.plans.analytics, sharing plan shape so results
converge when the stream is replayed bounded.
"""

from kmr_spark.streaming.windows import (
    sessionized_stream,
    sliding_counts_stream,
    stream_events,
    streaming_dedup,
    tumbling_counts_stream,
)

__all__ = [
    "stream_events",
    "tumbling_counts_stream",
    "sliding_counts_stream",
    "sessionized_stream",
    "streaming_dedup",
]
