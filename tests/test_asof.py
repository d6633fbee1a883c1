"""As-of join: backward semantics, ties, NULL row integrity, tolerance,
and bucketed-variant equivalence."""

from __future__ import annotations

import datetime
import random

import pytest
from pyspark.sql import types as T

from nlp_to_nosql_spark.operators.asof import asof_join, asof_join_bucketed


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute, 0)


LEFT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("key", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("rkey", T.LongType()),
        T.StructField("rts", T.TimestampType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("note", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts(5)),
            (2, 1, _ts(10)),   # exactly at a right row: inclusive match
            (3, 1, _ts(30)),
            (4, 2, _ts(8)),    # key 2 has no right row before: null
            (5, 3, _ts(9)),    # key 3 absent from right entirely
        ],
        LEFT_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            (1, _ts(0), 10.0, "a"),
            (1, _ts(10), 20.0, None),  # NULL note must stay with price 20
            (1, _ts(20), 30.0, "c"),
            (2, _ts(50), 99.0, "z"),   # after every left row of key 2
        ],
        RIGHT_SCHEMA,
    )
    return left, right


def _rows(df):
    return {
        r["event_id"]: (r["price"], r["note"])
        for r in df.collect()
    }


def test_backward_asof_semantics(frames):
    left, right = frames
    got = _rows(asof_join(left, right, "key", "rkey", "ts", "rts"))
    assert got[1] == (10.0, "a")      # latest at-or-before 0:05 is 0:00
    assert got[2] == (20.0, None)     # 0:10 matches 0:10 inclusively, note stays NULL
    assert got[3] == (30.0, "c")      # 0:30 → 0:20
    assert got[4] == (None, None)     # right row exists only later
    assert got[5] == (None, None)     # no right rows for key


def test_asof_tolerance(frames):
    left, right = frames
    got = _rows(
        asof_join(left, right, "key", "rkey", "ts", "rts", tolerance_s=300)
    )
    assert got[1] == (10.0, "a")      # 5 min gap == tolerance, kept
    assert got[3] == (None, None)     # 10 min gap > 5 min tolerance
    assert got[2] == (20.0, None)     # exact-time match


def test_left_row_count_preserved(frames):
    left, right = frames
    out = asof_join(left, right, "key", "rkey", "ts", "rts")
    assert out.count() == left.count()
    assert set(out.columns) == {"event_id", "key", "ts", "price", "note"}


@pytest.mark.parametrize("bucket", ["1 minute", "7 minutes", "1 hour"])
def test_bucketed_equals_plain_fixture(frames, bucket):
    # 1-minute buckets force cross-bucket sparse fills; 1-hour covers all
    # rows in a single bucket (degenerates to the plain algorithm).
    left, right = frames
    plain = _rows(asof_join(left, right, "key", "rkey", "ts", "rts"))
    bucketed = _rows(
        asof_join_bucketed(left, right, "key", "rkey", "ts", "rts", bucket=bucket)
    )
    assert bucketed == plain


def test_bucketed_equals_plain_randomized(spark):
    rng = random.Random(7)
    left = spark.createDataFrame(
        [
            (i, rng.randint(1, 5), _ts(0) + datetime.timedelta(seconds=rng.randint(0, 7200)))
            for i in range(300)
        ],
        LEFT_SCHEMA,
    )
    # unique (key, time) on the right, per the operator contract
    right_rows = {
        (rng.randint(1, 5), rng.randint(0, 7200)) for _ in range(120)
    }
    right = spark.createDataFrame(
        [
            (k, _ts(0) + datetime.timedelta(seconds=s), float(k * 1000 + s), "n")
            for (k, s) in right_rows
        ],
        RIGHT_SCHEMA,
    )
    plain = _rows(asof_join(left, right, "key", "rkey", "ts", "rts"))
    bucketed = _rows(
        asof_join_bucketed(left, right, "key", "rkey", "ts", "rts", bucket="10 minutes")
    )
    assert bucketed == plain


def test_bucketed_tolerance(frames):
    left, right = frames
    plain = _rows(asof_join(left, right, "key", "rkey", "ts", "rts", tolerance_s=300))
    bucketed = _rows(
        asof_join_bucketed(
            left, right, "key", "rkey", "ts", "rts", tolerance_s=300, bucket="3 minutes"
        )
    )
    assert bucketed == plain


def test_null_right_time_matches_nothing(spark):
    """A right row with NULL time must not become a universal match
    (DuckDB ASOF / pandas merge_asof semantics)."""
    import datetime

    from nlp_to_nosql_spark.operators.asof import asof_join, asof_join_bucketed

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame([(1, t(5))], "k long, lt timestamp")
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, t(10), 10.0)], "k long, rt timestamp, price double"
    )
    for fn in (asof_join, asof_join_bucketed):
        out = fn(left, right, "k", "k", "lt", "rt").collect()
        assert len(out) == 1 and out[0]["price"] is None, fn.__name__


def test_value_col_name_collision_raises(spark):
    import datetime

    import pytest as _pytest

    from nlp_to_nosql_spark.operators.asof import asof_join

    t = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t, 5.0)], "k long, lt timestamp, price double")
    right = spark.createDataFrame([(1, t, 9.0)], "k long, rt timestamp, price double")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "k", "k", "lt", "rt")
