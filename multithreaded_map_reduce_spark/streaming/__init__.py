from .events import stream_events, streaming_session_counts, streaming_tumbling_counts

__all__ = ["stream_events", "streaming_tumbling_counts", "streaming_session_counts"]
