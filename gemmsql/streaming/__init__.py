"""Structured Streaming variants of the engine's aggregations.

The reference's ``binary_reduce`` merge functions are exactly what
incremental/stateful streaming aggregation needs (associative +
commutative partial merges) — SURVEY.md §7 step 8.  This package reuses
those merges over ``readStream`` sources with watermarks.
"""

from gemmsql.streaming.windows import (
    read_events_stream,
    run_to_memory,
    stage_stream_dir,
    streaming_hourly_counts,
    streaming_session_windows,
    streaming_sliding_counts,
)
from gemmsql.streaming.stateful import streaming_logsumexp

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "stage_stream_dir",
    "streaming_hourly_counts",
    "streaming_session_windows",
    "streaming_sliding_counts",
    "streaming_logsumexp",
]
