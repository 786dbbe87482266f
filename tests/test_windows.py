"""Batch event-time windowing tests (tumbling/sliding/session)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, ts(0), 1),
        (2, ts(10), 1),
        (3, ts(45), 1),   # 35min gap → new session
        (4, ts(59, 59), 1),
        (5, ts(0), 2),
        (6, ts(31), 2),   # 31min gap → new session
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id"])


def test_tumbling(events):
    from wimbd_spark.operators.windows import tumbling_agg

    got = {
        r["window_start_s"]: r["n_events"]
        for r in tumbling_agg(events, duration_s=1800).collect()
    }
    base = int(dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == {base: 3, base + 1800: 3}


def test_sliding_each_event_in_two_windows(events):
    from wimbd_spark.operators.windows import sliding_agg

    rows = sliding_agg(events, duration_s=3600, slide_s=1800).collect()
    assert sum(r["n_events"] for r in rows) == 2 * events.count()


def test_sliding_rejects_nonmultiple(events):
    from wimbd_spark.operators.windows import sliding_agg

    with pytest.raises(ValueError):
        sliding_agg(events, duration_s=3600, slide_s=1700)


def test_sessionize(events):
    from wimbd_spark.operators.windows import sessionize

    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(events, gap_s=1800).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 2}


def test_session_stats(events):
    from wimbd_spark.operators.windows import session_stats

    rows = {
        (r["user_id"], r["session_id"]): r
        for r in session_stats(events, gap_s=1800).collect()
    }
    assert rows[(1, 1)]["n_events"] == 2
    assert rows[(1, 2)]["n_events"] == 2
    assert rows[(1, 2)]["duration_s"] == 14 * 60 + 59
    assert rows[(2, 2)]["n_events"] == 1


def test_session_gap_boundary(spark):
    # gap strictly greater-than: exactly 1800s stays in-session
    rows = [(1, ts(0), 1), (2, dt.datetime(2024, 1, 1, 0, 30), 1)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    from wimbd_spark.operators.windows import sessionize

    got = {r["event_id"]: r["session_id"] for r in sessionize(df, gap_s=1800).collect()}
    assert got == {1: 1, 2: 1}
