"""epoch_us / micros_to_ntz: zone-free field arithmetic vs DuckDB.

The engine pins its own sessions to UTC (session.py), but the driver
harness runs a PLAIN session inheriting the host zone — epoch math must
therefore be bit-equal to DuckDB's naive ``epoch_us()`` under ANY
session timezone, including wall times that do not exist in that zone
(spring-forward DST gap), which the old ``timestamp_diff``-based
implementation gap-shifted by an hour.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from nlp_to_nosql_spark.functions.time import epoch_us, micros_to_ntz

#: gap (NY spring-forward), overlap (NY fall-back), ordinary, micro
#: precision, pre-1970, far future
_CASES = [
    datetime.datetime(2024, 3, 10, 2, 30),
    datetime.datetime(2024, 11, 3, 1, 30),
    datetime.datetime(2024, 6, 1, 12, 0, 0, 1),
    datetime.datetime(2024, 1, 2, 3, 4, 5, 999999),
    datetime.datetime(1969, 12, 31, 23, 30),
    datetime.datetime(2150, 7, 1, 6, 0),
]


def _duckdb_epoch_us(dt: datetime.datetime) -> int:
    return duckdb.sql(
        "SELECT epoch_us(CAST(? AS TIMESTAMP))", params=[dt]
    ).fetchone()[0]


@pytest.mark.parametrize("tz", ["UTC", "America/New_York", "Asia/Kolkata"])
def test_epoch_us_matches_duckdb_in_any_session_zone(spark, tz):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_CASES)], "i int, ts timestamp_ntz"
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        got = [
            r["e"]
            for r in df.select("i", epoch_us("ts").alias("e"))
            .orderBy("i")
            .collect()
        ]
        back = [
            r["b"]
            for r in df.select("i", micros_to_ntz(epoch_us("ts")).alias("b"))
            .orderBy("i")
            .collect()
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == [_duckdb_epoch_us(v) for v in _CASES]
    assert back == _CASES  # micros_to_ntz inverts exactly, any zone


def test_epoch_us_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "ts timestamp_ntz")
    assert df.select(epoch_us("ts").alias("e")).first()["e"] is None
