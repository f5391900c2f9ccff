from .dwrf_stream import (
    sessionize,
    stateful_running_counts,
    stream_dwrf_dir,
    stream_stream_join,
    streaming_dedup,
    windowed_event_counts,
)

__all__ = [
    "stream_dwrf_dir",
    "windowed_event_counts",
    "sessionize",
    "stateful_running_counts",
    "streaming_dedup",
    "stream_stream_join",
]
