from .stream_kpis import stream_events, streaming_tumbling_counts, run_available_now

__all__ = ["stream_events", "streaming_tumbling_counts", "run_available_now"]
