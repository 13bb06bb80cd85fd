from .windows import (
    hourly_counts,
    read_events_stream,
    sessionize,
    sliding_value_avg,
    streaming_hourly_counts,
)

__all__ = [
    "hourly_counts",
    "read_events_stream",
    "sessionize",
    "sliding_value_avg",
    "streaming_hourly_counts",
]
