"""Property-based checks of the changelog operators: random changelogs
evaluated two ways — the partial-aggregated ``max_by`` compaction (the
Spark plan) and a pure-Python row_number-style reference (the oracle's
algorithm) — must agree exactly, including NULL attrs, equal
timestamps resolved by the unique id, and single-row keys.  This IS the
design claim: two different algorithms, one semantics.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from nlp_to_nosql_spark.operators.changelog import (
    latest_wins,
    scd2_intervals,
)

BASE = datetime.datetime(2024, 1, 1)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("attr", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# few keys, coarse minute grid (forces ts collisions), nullable attrs
row = st.tuples(
    st.sampled_from(["k1", "k2", "k3"]),
    st.sampled_from(["a", "b", None]),
    st.integers(min_value=0, max_value=5),
)
logs = st.lists(row, min_size=1, max_size=20)


def _rows(raw):
    return [
        (i, key, attr, BASE + datetime.timedelta(minutes=m))
        for i, (key, attr, m) in enumerate(raw)
    ]


def _latest_reference(rows):
    best = {}
    for rid, key, attr, ts in rows:
        cur = best.get(key)
        if cur is None or (ts, rid) > (cur[0], cur[1]):
            best[key] = (ts, rid, attr)
    return {k: (v[1], v[2]) for k, v in best.items()}


def _scd2_reference(rows):
    per_key = {}
    for rid, key, attr, ts in sorted(rows, key=lambda r: (r[3], r[0])):
        per_key.setdefault(key, []).append((attr, ts))
    out = {}
    for key, seq in per_key.items():
        segs = []
        for attr, ts in seq:
            if not segs or segs[-1][0] != attr:
                segs.append([attr, ts])
        out[key] = [(a, t) for a, t in segs]
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(logs)
def test_latest_wins_matches_reference(spark, raw):
    rows = _rows(raw)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["key"]: (r["id"], r["attr"])
        for r in latest_wins(df, ["key"], ["ts", "id"], ["attr"]).collect()
    }
    assert got == _latest_reference(rows)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(logs)
def test_scd2_segments_match_reference(spark, raw):
    rows = _rows(raw)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {}
    for r in scd2_intervals(df, "key", "attr", "ts", "id").collect():
        got.setdefault(r["key"], []).append(
            (r["version"], r["attr"], r["valid_from"])
        )
    got = {
        k: [(a, t) for _, a, t in sorted(v)] for k, v in got.items()
    }
    assert got == _scd2_reference(rows)


# ---------------------------------------------------------------------------
# funnel property: chained conditional window MINs vs a pure-Python walk
# ---------------------------------------------------------------------------

FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

funnel_row = st.tuples(
    st.integers(min_value=1, max_value=3),                  # user
    st.sampled_from(["view", "click", "purchase", "noise"]),
    st.integers(min_value=0, max_value=4),                  # coarse minutes
)
funnel_logs = st.lists(funnel_row, min_size=1, max_size=20)

_STAGES = ("view", "click", "purchase")


def _funnel_reference(rows):
    """Documented semantics: earliest stage-0 event, then earliest
    stage-1 event STRICTLY after it, etc."""
    out = {}
    for user in {r[1] for r in rows}:
        evs = sorted(
            (r[3], r[2]) for r in rows if r[1] == user
        )
        reached, prev_ts = [], None
        for stage in _STAGES:
            cand = [
                ts
                for ts, typ in evs
                if typ == stage and (prev_ts is None or ts > prev_ts)
            ]
            if not cand:
                break
            prev_ts = min(cand)
            reached.append(prev_ts)
        out[user] = (len(reached), reached)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(funnel_logs)
def test_funnel_matches_reference(spark, raw):
    from nlp_to_nosql_spark.operators.funnel import funnel_stages

    rows = [
        (i, user, typ, BASE + datetime.timedelta(minutes=m))
        for i, (user, typ, m) in enumerate(raw)
    ]
    df = spark.createDataFrame(rows, FUNNEL_SCHEMA)
    got = {
        r["user_id"]: (
            r["funnel_stage"],
            [t for t in (r["view_ts"], r["click_ts"], r["purchase_ts"]) if t],
        )
        for r in funnel_stages(df).collect()
    }
    assert got == _funnel_reference(rows)
