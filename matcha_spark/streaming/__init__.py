from .events import hourly_counts, sessionize_stateful, sliding_activity, stream_dedup
