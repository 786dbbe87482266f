"""Structured Streaming operators for the events stream.

The reference is batch-only (SURVEY.md §1.4); this is the green-field
streaming path for event tables: readStream → event-time windows with
watermarks → sinks. Each operator is the streaming twin of a batch
operator in wimbd_spark.operators.windows — same column expressions,
so batch backfill and streaming produce consistent results (the
lambda-architecture property for free).

Scale notes: watermark bounds state; tumbling/sliding aggs keep one
row of state per (window, key); session windows merge state per key.
For custom state machines, `stateful_user_counts` shows the
applyInPandasWithState pattern (Arrow-batched, state in the store, one
group per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "json",
    schema: StructType = EVENT_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream (each new file = a micro-batch of
    events). Kafka/socket sources drop in with the same downstream
    plan."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def tumbling_counts_stream(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
) -> DataFrame:
    """Windowed counts with late-data tolerance = watermark.

    State per (window, key) is dropped once the watermark passes the
    window end — bounded memory at any stream length.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            *keys,
            "n_events",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = (),
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding windowed counts (each event in duration/slide windows)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"),
            *keys,
            "n_events",
        )
    )


def session_window_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Native session windows (gap-merged state per user) — the
    streaming twin of operators.windows.sessionize."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.unix_timestamp("w.start").alias("session_start_s"),
            F.unix_timestamp("w.end").alias("session_end_s"),
            "n_events",
        )
    )


STATE_SCHEMA = StructType([StructField("total", LongType())])
USER_COUNT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
    ]
)


def stateful_user_counts(
    events: DataFrame,
    user_col: str = "user_id",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator: running per-user event totals via
    applyInPandasWithState — the template for arbitrary per-key state
    machines (fraud scoring, rate limiting, dedup-within-horizon).

    ``timeout_ms`` bounds the state store (the 100 TB requirement for
    an unbounded key space): each key's state expires
    ``timeout_ms`` of processing time after its last event, emitting
    a final (user_id, total) row, and a later event for the same key
    starts the count over. None = totals over the whole stream
    lifetime — state grows with DISTINCT keys, which is fine for a
    bounded user population and wrong for, e.g., per-URL keys."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, batches, state: GroupState):
        import pandas as pd

        if timeout_ms is not None and state.hasTimedOut:
            # horizon passed with no new events: emit the final total
            # and drop the state — the next event starts from zero
            total = state.get[0] if state.exists else 0
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "total_events": [total]}
            )
            return
        n = 0
        for pdf in batches:
            n += len(pdf)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_events": [total]}
        )

    return events.groupBy(F.col(user_col)).applyInPandasWithState(
        update,
        outputStructType=USER_COUNT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout,
    )
