from wimbd_spark.streaming.windows import (
    read_event_stream,
    session_window_stream,
    sliding_counts_stream,
    stateful_user_counts,
    tumbling_counts_stream,
)

__all__ = [
    "read_event_stream",
    "session_window_stream",
    "sliding_counts_stream",
    "stateful_user_counts",
    "tumbling_counts_stream",
]
