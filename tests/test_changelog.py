"""Changelog compaction + SCD2 interval tests (operators/changelog.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nlp_to_nosql_spark.operators.changelog import (
    latest_wins,
    scd2_intervals,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        # (id, key, attr, ts, value)
        (1, "u1", "login", _ts("2024-01-01T10:00:00"), 1.0),
        (2, "u1", "click", _ts("2024-01-01T11:00:00"), 2.0),
        (3, "u1", "click", _ts("2024-01-01T12:00:00"), 3.0),
        (4, "u1", "login", _ts("2024-01-01T13:00:00"), 4.0),  # A->B->A
        (5, "u2", "view", _ts("2024-01-01T10:30:00"), 5.0),
        # equal-timestamp tie for u2: higher id wins latest_wins
        (6, "u2", "view", _ts("2024-01-01T10:30:00"), 6.0),
        (7, "u3", None, _ts("2024-01-01T09:00:00"), 7.0),  # NULL attr
        (8, "u3", None, _ts("2024-01-01T09:30:00"), 8.0),
        (9, "u3", "buy", _ts("2024-01-01T10:00:00"), 9.0),
    ]
    return spark.createDataFrame(
        rows, "id long, key string, attr string, ts timestamp, value double"
    )


def test_latest_wins_one_row_per_key(log):
    out = latest_wins(log, ["key"], ["ts", "id"], ["attr", "value"])
    got = {r["key"]: r for r in out.collect()}
    assert set(got) == {"u1", "u2", "u3"}
    assert got["u1"]["id"] == 4 and got["u1"]["value"] == 4.0
    # equal ts: id breaks the tie, 6 wins
    assert got["u2"]["id"] == 6 and got["u2"]["value"] == 6.0
    assert got["u3"]["attr"] == "buy"


def test_latest_wins_compound_key(log):
    out = latest_wins(log, ["key", "attr"], ["ts", "id"], ["value"])
    got = {(r["key"], r["attr"]): r["value"] for r in out.collect()}
    assert got[("u1", "click")] == 3.0
    assert got[("u1", "login")] == 4.0  # the later login, not the first
    assert got[("u3", None)] == 8.0  # NULL attr is a real key


def test_latest_wins_plan_is_partial_aggregate(log):
    plan = latest_wins(
        log, ["key"], ["ts", "id"], ["value"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan  # map-side combine before the shuffle
    assert "Window" not in plan  # max_by formulation, not row_number


def test_scd2_segments(log):
    out = scd2_intervals(log, "key", "attr", "ts", "id")
    u1 = sorted(
        (r for r in out.collect() if r["key"] == "u1"),
        key=lambda r: r["version"],
    )
    # login -> click -> login = 3 segments (re-appearing value reopens)
    assert [r["attr"] for r in u1] == ["login", "click", "login"]
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert u1[2]["valid_to"] is None  # open segment
    assert [r["version"] for r in u1] == [1, 2, 3]


def test_scd2_null_attr_is_a_segment(log):
    out = scd2_intervals(log, "key", "attr", "ts", "id")
    u3 = sorted(
        (r for r in out.collect() if r["key"] == "u3"),
        key=lambda r: r["version"],
    )
    # two NULL observations collapse into ONE segment, then buy
    assert [r["attr"] for r in u3] == [None, "buy"]
    assert u3[0]["valid_from"] == _ts("2024-01-01T09:00:00")
    assert u3[0]["valid_to"] == _ts("2024-01-01T10:00:00")


def test_scd2_single_exchange(log):
    plan = scd2_intervals(
        log, "key", "attr", "ts", "id"
    )._jdf.queryExecution().executedPlan().toString()
    # both windows partition on the same key -> exactly one shuffle
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_snapshot_point_in_time(spark, log):
    from nlp_to_nosql_spark.operators.changelog import (
        scd2_intervals,
        scd2_snapshot,
    )

    iv = scd2_intervals(log, "key", "attr", "ts", "id")
    # at 11:30, u1 is in its 'click' segment (11:00-13:00)
    got = {
        r["key"]: (r["attr"], r["version"])
        for r in scd2_snapshot(iv, "key", "attr", "2024-01-01T11:30:00").collect()
    }
    assert got["u1"] == ("click", 2)
    assert got["u2"] == ("view", 1)  # open segment
    assert got["u3"] == ("buy", 2)  # buy segment open since 10:00
    # inside u3's NULL-attr segment (09:00-10:00): NULL is a real value
    at_930 = {
        r["key"]: (r["attr"], r["version"])
        for r in scd2_snapshot(iv, "key", "attr", "2024-01-01T09:30:00").collect()
    }
    assert at_930["u3"] == (None, 1)
    # before anyone existed: empty snapshot
    empty = scd2_snapshot(iv, "key", "attr", "2023-12-31T00:00:00").collect()
    assert empty == []
