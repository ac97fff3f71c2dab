"""Structured Streaming surface — SURVEY.md §2.9."""

from .events import (
    events_file_stream,
    session_windows,
    sliding_avg,
    tumbling_rollup,
    write_stream_to_memory,
)
from .hll_stream import (
    hll_register_stream,
    hll_registers,
    write_stream_hll_ingest,
)
from .lake_stream import (
    maintain_rollup_view,
    present_rollup_view,
    register as register_lake_cdf,
)

__all__ = [
    "events_file_stream",
    "hll_register_stream",
    "hll_registers",
    "maintain_rollup_view",
    "present_rollup_view",
    "register_lake_cdf",
    "session_windows",
    "sliding_avg",
    "tumbling_rollup",
    "write_stream_hll_ingest",
    "write_stream_to_memory",
]
