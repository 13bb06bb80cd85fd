from .stateful import (
    running_user_totals,
    running_user_totals_tws,
    transform_with_state_available,
)
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
    "running_user_totals_tws",
    "transform_with_state_available",
    "read_events_stream",
    "sessionize",
    "sliding_value_avg",
    "streaming_hourly_counts",
]
