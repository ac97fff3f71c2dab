"""Structured Streaming surface — SURVEY.md §2.9."""

from .events import (
    events_file_stream,
    session_windows,
    sliding_avg,
    tumbling_rollup,
    write_stream_to_memory,
)

__all__ = [
    "events_file_stream",
    "session_windows",
    "sliding_avg",
    "tumbling_rollup",
    "write_stream_to_memory",
]
