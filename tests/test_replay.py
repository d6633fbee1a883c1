"""Bounded streaming replay must equal the batch operators exactly."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F, types as T

from nlp_to_nosql_spark.operators.sessions import sessionize
from nlp_to_nosql_spark.streaming.history import windowed_event_counts
from nlp_to_nosql_spark.streaming.replay import (
    replay_sessionize,
    replay_windowed_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(minute: float) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minute)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions split by a 45-min gap; sub-second edge at
        # exactly gap + 1 microsecond (catches second-truncation bugs)
        (1, 1, _ts(0), "click", 1.0),
        (2, 1, _ts(10), "view", 2.0),
        (3, 1, _ts(40) + datetime.timedelta(microseconds=1), "click", 4.0),
        (4, 1, _ts(41), "click", 8.0),
        # user 2: single session
        (5, 2, _ts(5), "view", 16.0),
        (6, 2, _ts(30), "click", 32.0),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_replay_sessionize_equals_batch(spark, events):
    cols = ["user_id", "session_idx", "session_start", "session_end",
            "n_events", "sum_value"]
    got = _rows(replay_sessionize(spark, events, gap_minutes=30, tag="t1"), cols)
    want = _rows(sessionize(events, gap_minutes=30), cols)
    assert got == want
    # the microsecond-over-gap edge really did split user 1's sessions
    assert len([r for r in got if r[0] == 1]) == 2


def test_replay_windowed_counts_equals_batch(spark, events):
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    got = _rows(replay_windowed_counts(spark, events, tag="t2"), cols)
    want = _rows(windowed_event_counts(events), cols)
    assert got == want and len(got) > 0
