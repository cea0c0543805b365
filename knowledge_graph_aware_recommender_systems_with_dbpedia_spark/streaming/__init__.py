from .events import (
    hourly_rollup,
    purchases_within_signup_window,
    read_events_stream,
    run_to_memory,
    sessionize,
    sliding_rollup,
    with_event_time,
)
from .stateful import sessionize_stateful

__all__ = [
    "hourly_rollup",
    "purchases_within_signup_window",
    "read_events_stream",
    "run_to_memory",
    "sessionize",
    "sessionize_stateful",
    "sliding_rollup",
    "with_event_time",
]
