"""Range join: containment semantics, bucket-boundary spans, key matching."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import types as T

from nlp_to_nosql_spark.operators.interval import range_join


def _ts(minute: float) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, 0) + datetime.timedelta(minutes=minute)


POINTS = T.StructType(
    [
        T.StructField("pid", T.LongType()),
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

INTERVALS = T.StructType(
    [
        T.StructField("iid", T.LongType()),
        T.StructField("ik", T.LongType()),
        T.StructField("start", T.TimestampType()),
        T.StructField("end", T.TimestampType()),
    ]
)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            (1, 1, _ts(5)),
            (2, 1, _ts(30)),    # interval boundary: inclusive end
            (3, 1, _ts(31)),    # just outside
            (4, 2, _ts(5)),     # right key, wrong interval key below
            (5, 1, _ts(125)),   # inside the bucket-spanning interval
        ],
        POINTS,
    )
    intervals = spark.createDataFrame(
        [
            (10, 1, _ts(0), _ts(30)),
            (11, 2, _ts(100), _ts(200)),   # spans multiple 1-hour buckets
            (12, 1, _ts(100), _ts(200)),
        ],
        INTERVALS,
    )
    return points, intervals


def test_containment_and_keys(frames):
    points, intervals = frames
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "ts", "start", "end",
            bucket_s=3600, left_keys=["k"], right_keys=["ik"],
        ).collect()
    }
    assert got == {(1, 10), (2, 10), (5, 12)}


def test_no_keys_matches_all_overlapping(frames):
    points, intervals = frames
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "ts", "start", "end", bucket_s=600
        ).collect()
    }
    # without keys, point 5 (t=125) falls in both 100-200 intervals
    assert got == {(1, 10), (2, 10), (4, 10), (5, 11), (5, 12)}


def test_small_buckets_no_duplicates(frames):
    points, intervals = frames
    out = range_join(
        points, intervals, "ts", "start", "end",
        bucket_s=60, left_keys=["k"], right_keys=["ik"],
    )
    rows = [(r["pid"], r["iid"]) for r in out.collect()]
    assert len(rows) == len(set(rows)) == 3


def test_pre_1970_points_match(spark):
    """Negative-epoch timestamps: floor (not truncate-toward-zero) bucket
    math must put a point and its containing interval in the same bucket."""
    old = datetime.datetime(1969, 12, 31, 23, 30)
    points = spark.createDataFrame([(1, 1, old)], POINTS)
    intervals = spark.createDataFrame(
        [(10, 1, old - datetime.timedelta(minutes=10),
          old + datetime.timedelta(minutes=10))],
        INTERVALS,
    )
    got = [
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "ts", "start", "end",
            bucket_s=3600, left_keys=["k"], right_keys=["ik"],
        ).collect()
    ]
    assert got == [(1, 10)]


def test_range_join_interval_span_circuit_breaker(spark):
    """A corrupt open-ended interval must raise a clear error instead of
    exploding millions of bucket rows (or passing Spark's array limit)."""
    import datetime

    import pytest as _pytest

    from nlp_to_nosql_spark.operators.interval import range_join

    t = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame([(t,)], "pt timestamp")
    right = spark.createDataFrame(
        [(t, datetime.datetime(2200, 1, 1))], "s timestamp, e timestamp"
    )
    with _pytest.raises(Exception, match="range_join: interval spans"):
        range_join(left, right, "pt", "s", "e", bucket_s=60).collect()
    # a sane interval still joins
    ok_right = spark.createDataFrame(
        [(t, t + datetime.timedelta(hours=2))], "s timestamp, e timestamp"
    )
    assert range_join(left, ok_right, "pt", "s", "e", bucket_s=3600).count() == 1


def test_range_join_null_bounds_drop_not_raise(spark):
    """A NULL start/end must drop the interval row (like asof drops NULL
    times), NOT trip the replication circuit breaker: three-valued span_ok
    would otherwise route NULL bounds into raise_error and one bad row
    would kill the whole join."""
    import datetime

    from nlp_to_nosql_spark.operators.interval import range_join

    t = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame([(t,)], "pt timestamp")
    right = spark.createDataFrame(
        [
            (t, None),                                      # NULL end
            (None, t + datetime.timedelta(hours=1)),        # NULL start
            (t, t + datetime.timedelta(hours=1)),           # valid
        ],
        "s timestamp, e timestamp",
    )
    out = range_join(left, right, "pt", "s", "e", bucket_s=3600).collect()
    assert len(out) == 1 and out[0]["s"] == t
