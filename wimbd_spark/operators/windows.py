"""Event-time windowing operators (batch forms).

The reference is pure batch over static corpora (SURVEY.md §1.4); these
are the green-field event-stream extensions. Each has a streaming twin
in wimbd_spark.streaming built on the same column expressions, and a
batch form here whose semantics are SQL-expressible (oracle-checkable).

Timestamps: source parquet is nanosecond-precision; Spark holds µs.
All window math is done on integer epoch MICROSECONDS so a DuckDB
oracle computes the identical buckets (epoch_us both sides); outputs
expose window starts as epoch SECONDS (bigint) — never raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration_s: int = 3600,
    keys: tuple[str, ...] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling event-time windows → (window_start_s, *keys, n_events
    [, sum_value]). Equivalent to F.window(ts, duration) but bucketed
    via integer µs arithmetic for cross-engine determinism.
    """
    dur_us = duration_s * 1_000_000
    start = (
        F.floor(F.unix_micros(F.col(ts_col)) / dur_us) * duration_s
    ).cast("long")
    gb = df.groupBy(start.alias("window_start_s"), *keys)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value")
        )
    return gb.agg(*aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration_s: int = 3600,
    slide_s: int = 1800,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Sliding windows (duration, slide) → (window_start_s, *keys,
    n_events). Each event lands in duration/slide windows; generated
    via sequence+explode (same assignment rule as F.window(ts, dur,
    slide): all starts s ≡ 0 mod slide with s <= t < s+dur).
    """
    if duration_s % slide_s != 0:
        raise ValueError("duration_s must be a multiple of slide_s")
    k = duration_s // slide_s
    us = F.unix_micros(F.col(ts_col))
    base = F.floor(us / (slide_s * 1_000_000)).cast("long") * slide_s
    starts = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: base - i.cast("long") * slide_s,
    )
    return (
        df.select(F.explode(starts).alias("window_start_s"), *keys)
        .groupBy("window_start_s", *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_s: int = 1800,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids per user (batch sessionization).

    A new session starts when the gap to the previous event of the
    same user exceeds gap_s. Returns the input plus `session_id`
    (1-based per user). Streaming twin: F.session_window /
    applyInPandasWithState in wimbd_spark.streaming.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    gap_us = gap_s * 1_000_000
    new_sess = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_s: int = 1800,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-session summary → (user, session_id, n_events,
    start_s, end_s, duration_s)."""
    s = sessionize(df, ts_col, user_col, gap_s, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.floor(F.min(us) / 1_000_000).cast("long").alias("start_s"),
            F.floor(F.max(us) / 1_000_000).cast("long").alias("end_s"),
        )
        .withColumn(
            "duration_s", (F.col("end_s") - F.col("start_s")).cast("long")
        )
    )
