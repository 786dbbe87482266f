from wimbd_spark.streaming.dedup import (
    eval_gram_table,
    read_doc_stream,
    reference_band_table,
    streaming_contamination_hits,
    streaming_decontaminate,
    streaming_decontaminate_by_ngrams,
    streaming_dedup_exact,
    streaming_neardup_filter,
    streaming_quality_gate,
)
from wimbd_spark.streaming.windows import (
    read_event_stream,
    session_window_stream,
    sliding_counts_stream,
    stateful_user_counts,
    tumbling_counts_stream,
)

__all__ = [
    "eval_gram_table",
    "read_doc_stream",
    "read_event_stream",
    "reference_band_table",
    "session_window_stream",
    "sliding_counts_stream",
    "stateful_user_counts",
    "streaming_contamination_hits",
    "streaming_decontaminate",
    "streaming_decontaminate_by_ngrams",
    "streaming_dedup_exact",
    "streaming_neardup_filter",
    "streaming_quality_gate",
    "tumbling_counts_stream",
]
