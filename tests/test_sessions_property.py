"""Property-based checks of the custom sessionize and chunk-span
operators (SURVEY §5 strategy): random inputs evaluated two ways — the
Spark operator and a pure-Python reference implementing the documented
semantics — must agree exactly.  Catches gap-edge / ordering /
short-input drift that example tests miss.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F, types as T

from nlp_to_nosql_spark.operators.dedup import chunk_spans
from nlp_to_nosql_spark.operators.sessions import sessionize

BASE = datetime.datetime(2024, 1, 1)
GAP_MIN = 30

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

# Events: a few users, minute offsets clustered near the gap boundary
# (29, 30, 31 minutes) plus microsecond jitter so the strict-gt edge is
# exercised, integer values so sums are exact.
event = st.tuples(
    st.integers(min_value=1, max_value=3),                 # user
    st.integers(min_value=0, max_value=200),               # minutes
    st.sampled_from([0, 1, 30 * 60 * 1_000_000]),          # extra micros
    st.integers(min_value=0, max_value=50),                # value
)
event_lists = st.lists(event, min_size=1, max_size=25)


def _sessions_reference(rows):
    """Pure-Python sessionize: per user, sort by (ts, event_id), split
    where gap > GAP_MIN minutes (strictly)."""
    per_user = {}
    for eid, (user, minutes, extra_us, value) in enumerate(rows):
        ts = BASE + datetime.timedelta(minutes=minutes, microseconds=extra_us)
        per_user.setdefault(user, []).append((ts, eid, value))
    out = set()
    gap = datetime.timedelta(minutes=GAP_MIN)
    for user, evs in per_user.items():
        evs.sort()
        sessions = []
        for ts, _eid, value in evs:
            if sessions and ts - sessions[-1][-1][0] <= gap:
                sessions[-1].append((ts, value))
            else:
                sessions.append([(ts, value)])
        for idx, sess in enumerate(sessions, start=1):
            out.add(
                (
                    user,
                    idx,
                    sess[0][0],
                    sess[-1][0],
                    len(sess),
                    sum(v for _, v in sess),
                )
            )
    return out


@pytest.mark.usefixtures("spark")
@given(event_lists)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sessionize_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        [
            (
                eid,
                user,
                BASE + datetime.timedelta(minutes=minutes, microseconds=extra_us),
                float(value),
            )
            for eid, (user, minutes, extra_us, value) in enumerate(rows)
        ],
        EVENT_SCHEMA,
    )
    got = {
        (
            r["user_id"],
            r["session_idx"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in sessionize(df, gap_minutes=GAP_MIN).collect()
    }
    assert got == _sessions_reference(rows)


# ---------------------------------------------------------------------------
# chunk_spans vs a python reference
# ---------------------------------------------------------------------------

words_lists = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "x"]),
    min_size=1,
    max_size=12,
)
params = st.tuples(
    st.integers(min_value=2, max_value=5),   # k
    st.integers(min_value=1, max_value=3),   # stride
)


def _chunks_reference(words, k, stride):
    if len(words) < k:
        return [" ".join(words)]
    return [
        " ".join(words[i : i + k]) for i in range(0, len(words) - k + 1, stride)
    ]


@pytest.mark.usefixtures("spark")
@given(st.lists(words_lists, min_size=1, max_size=4), params)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunk_spans_matches_python_reference(spark, docs, kp):
    k, stride = kp
    df = spark.createDataFrame(
        [(i, words) for i, words in enumerate(docs)],
        "doc_id long, words array<string>",
    )
    got = {
        r["doc_id"]: list(r["chunks"])
        for r in df.select(
            "doc_id", chunk_spans(F.col("words"), k, stride).alias("chunks")
        ).collect()
    }
    want = {i: _chunks_reference(words, k, stride) for i, words in enumerate(docs)}
    assert got == want
