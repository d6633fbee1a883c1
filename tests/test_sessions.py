"""Sessionization: batch window form vs hand-computed truth, plus the
streaming stateful form fed by a file stream."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F, types as T

from nlp_to_nosql_spark.operators.sessions import sessionize, sessionize_stream

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(minute: float) -> datetime.datetime:
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    return base + datetime.timedelta(minutes=minute)


@pytest.fixture(scope="module")
def events(spark):
    # user 1: two sessions (gap 45 min > 30); user 2: one session.
    rows = [
        (1, 1, _ts(0), 1.0),
        (2, 1, _ts(10), 2.0),
        (3, 1, _ts(55), 4.0),   # 45 min after event 2 → new session
        (4, 1, _ts(60), 8.0),
        (5, 2, _ts(5), 16.0),
        (6, 2, _ts(34.5), 32.0),  # 29.5 min gap → same session
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_sessionize_batch(events):
    out = sessionize(events, gap_minutes=30).orderBy("user_id", "session_idx")
    got = [
        (r["user_id"], r["session_idx"], r["session_start"], r["session_end"],
         r["n_events"], r["sum_value"])
        for r in out.collect()
    ]
    assert got == [
        (1, 1, _ts(0), _ts(10), 2, 3.0),
        (1, 2, _ts(55), _ts(60), 2, 12.0),
        (2, 1, _ts(5), _ts(34.5), 2, 48.0),
    ]


def test_sessionize_exact_gap_is_same_session(spark):
    # exactly 30:00.000000 gap is NOT greater than the gap → same session
    rows = [(1, 1, _ts(0), 1.0), (2, 1, _ts(30), 1.0)]
    out = sessionize(spark.createDataFrame(rows, EVENT_SCHEMA), gap_minutes=30)
    assert out.count() == 1


def test_sessionize_stream_matches_batch(spark, events, tmp_path):
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    # late "flush" event far in the future advances the watermark past every
    # real session so all of them close and emit.
    flush = spark.createDataFrame(
        [(99, 99, _ts(10_000), 0.0)], EVENT_SCHEMA
    )
    flush.write.mode("append").parquet(src)

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         float(r["sum_value"]))
        for r in spark.sql("SELECT * FROM sess_out").collect()
        if r["user_id"] != 99
    }
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         float(r["sum_value"]))
        for r in sessionize(events, gap_minutes=30).collect()
    }
    assert got == batch


def test_native_session_window_edge_matches_custom(spark):
    """Spark's native session_window MERGES an event at exactly
    gap == duration — the same break rule as the custom sessionize
    (which splits only at gap > duration).  Pinned here so the sess2
    oracle's `>` break condition stays honest, and a strictly larger
    gap does split."""
    rows = [(1, 1, _ts(0), 1.0), (2, 1, _ts(30), 1.0)]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)

    native = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .collect()
    )
    assert len(native) == 1  # exact-gap event merges, like sessionize
    assert sessionize(df, gap_minutes=30).count() == 1
    # window end = last event + gap
    assert native[0]["session_window"]["end"] == _ts(60)

    over = [(1, 1, _ts(0), 1.0), (2, 1, _ts(30.001), 1.0)]
    df2 = spark.createDataFrame(over, EVENT_SCHEMA)
    assert (
        df2.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .count()
        == 2
    )
    assert sessionize(df2, gap_minutes=30).count() == 2
