from .dwrf_stream import stream_dwrf_dir, windowed_event_counts, sessionize

__all__ = ["stream_dwrf_dir", "windowed_event_counts", "sessionize"]
