from .stateful import running_user_totals
from .windows import (
    hourly_counts,
    read_events_stream,
    sessionize,
    sliding_value_avg,
    streaming_hourly_counts,
)

__all__ = [
    "hourly_counts",
    "running_user_totals",
    "read_events_stream",
    "sessionize",
    "sliding_value_avg",
    "streaming_hourly_counts",
]
