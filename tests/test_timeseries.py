"""Gap-filled time-series rollups (operators/timeseries.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from nlp_to_nosql_spark.operators.timeseries import gapfill_counts


def _ev(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp_ntz")


def test_gapfill_densifies_silent_hours(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    rows = [
        ("a", t0),
        ("a", t0 + datetime.timedelta(hours=3)),  # hours 1 and 2 silent
        ("b", t0 + datetime.timedelta(hours=1)),
    ]
    out = gapfill_counts(_ev(spark, rows), "key", "ts", "hour").collect()
    got = {(r["key"], r["bucket"].hour): r["n_events"] for r in out}
    # 2 keys x 4 hours (global bounds 00:00..03:00) = 8 dense rows
    assert len(out) == 8
    assert got[("a", 0)] == 1 and got[("a", 3)] == 1
    assert got[("a", 1)] == 0 and got[("a", 2)] == 0  # zero, not absent
    # key b is densified across the GLOBAL range, not its own span
    assert got[("b", 0)] == 0 and got[("b", 1)] == 1 and got[("b", 3)] == 0


def test_gapfill_counts_multiple_events_per_bucket(spark):
    t0 = datetime.datetime(2024, 6, 1, 12, 0)
    rows = [("a", t0 + datetime.timedelta(minutes=m)) for m in (0, 10, 50)]
    out = gapfill_counts(_ev(spark, rows), "key", "ts", "hour").collect()
    assert len(out) == 1 and out[0]["n_events"] == 3


def test_gapfill_day_unit_and_type_preserved(spark):
    t0 = datetime.datetime(2024, 3, 1)
    rows = [("a", t0), ("a", t0 + datetime.timedelta(days=2))]
    df = _ev(spark, rows)
    out = gapfill_counts(df, "key", "ts", "day")
    # buckets are epoch-floored NTZ (zone-independent), NOT date_trunc's
    # session-zone TIMESTAMP — pin the flavor so a silent change is
    # caught here, not by the driver hash
    from pyspark.sql import types as T

    assert out.schema["bucket"].dataType == T.TimestampNTZType()
    days = sorted(r["bucket"].day for r in out.collect())
    assert days == [1, 2, 3]


def test_gapfill_buckets_are_session_zone_independent(spark):
    """The motivating property: identical NTZ input must bucket to the
    identical naive wall-clock hour under ANY session timezone (a
    date_trunc-based implementation fails this)."""
    t0 = datetime.datetime(2024, 3, 10, 2, 30)  # US DST-gap wall time
    df = _ev(spark, [("a", t0)])
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got_ny = gapfill_counts(df, "key", "ts", "hour").collect()
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        got_utc = gapfill_counts(df, "key", "ts", "hour").collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got_ny == got_utc
    assert got_ny[0]["bucket"] == datetime.datetime(2024, 3, 10, 2, 0)


def test_gapfill_rejects_unknown_unit(spark):
    df = _ev(spark, [("a", datetime.datetime(2024, 1, 1))])
    with pytest.raises(ValueError, match="unit"):
        gapfill_counts(df, "key", "ts", "fortnight")


def test_gapfill_null_timestamps_excluded_from_bounds(spark):
    """A NULL event time must not produce a NULL bucket row or stretch
    the grid; it lands in the NULL bucket which stays out of bounds."""
    t0 = datetime.datetime(2024, 1, 1, 5, 0)
    df = spark.createDataFrame(
        [("a", t0), ("a", None)], "key string, ts timestamp_ntz"
    )
    out = gapfill_counts(df, "key", "ts", "hour").collect()
    buckets = [r["bucket"] for r in out]
    assert None not in buckets
    assert len(out) == 1 and out[0]["n_events"] == 1
