"""Funnel + cohort retention tests (operators/funnel.py)."""

import datetime as dt
import os

import pytest

from nlp_to_nosql_spark.operators.funnel import (
    cohort_retention,
    cohort_sql,
    funnel_sql,
    funnel_stages,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 full funnel in order
        (1, "view", _ts(9)),
        (1, "click", _ts(10)),
        (1, "purchase", _ts(11)),
        # u2: purchase BEFORE view -> ordered funnel stops at view
        (2, "purchase", _ts(8)),
        (2, "view", _ts(9)),
        # u3: view + click at the SAME instant -> strict > blocks stage 2
        (3, "view", _ts(9)),
        (3, "click", _ts(9)),
        # u4: never viewed
        (4, "click", _ts(9)),
        (4, "purchase", _ts(10)),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_ordered_semantics(events):
    got = {r["user_id"]: r for r in funnel_stages(events).collect()}
    assert got[1]["funnel_stage"] == 3
    assert got[1]["purchase_ts"] == _ts(11)
    assert got[2]["funnel_stage"] == 1  # early purchase doesn't count
    assert got[2]["click_ts"] is None
    assert got[3]["funnel_stage"] == 1  # simultaneous click blocked
    assert got[4]["funnel_stage"] == 0
    assert got[4]["view_ts"] is None


def test_funnel_single_exchange(events):
    plan = funnel_stages(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_matches_duckdb(spark):
    import duckdb

    from nlp_to_nosql_spark.sources.catalog import register_tables

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata not present")
    ev = register_tables(spark, sf_dir)["events"]
    got = {
        r["user_id"]: (r["funnel_stage"], r["view_ts"], r["purchase_ts"])
        for r in funnel_stages(ev).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = {
        u: (s, v, p)
        for u, v, c, p, s in con.execute(funnel_sql()).fetchall()
    }
    assert got == want


def test_cohort_retention_counts(spark):
    wk = 7 * 86_400_000_000
    rows = [
        (1, dt.datetime(2024, 1, 1)),   # cohort W
        (1, dt.datetime(2024, 1, 10)),  # W+1
        (1, dt.datetime(2024, 1, 10, 5)),  # same week, counted once
        (2, dt.datetime(2024, 1, 2)),   # cohort W, never returns
        (3, dt.datetime(2024, 1, 9)),   # cohort W+1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_week"] % 10_000, r["week_offset"]): r["n_users"]
        for r in cohort_retention(df, bucket_us=wk).collect()
    }
    offsets = {k[1]: v for k, v in got.items() if k[1] > 0}
    assert offsets == {1: 1}  # only u1 returned, one week later
    assert sum(v for k, v in got.items() if k[1] == 0) == 3


def test_cohort_matches_duckdb(spark):
    import duckdb

    from nlp_to_nosql_spark.sources.catalog import register_tables

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata not present")
    ev = register_tables(spark, sf_dir)["events"]
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = {(c, o): n for c, o, n in con.execute(cohort_sql()).fetchall()}
    assert got == want


def test_event_transitions_counts(spark):
    from nlp_to_nosql_spark.operators.funnel import event_transitions

    rows = [
        (1, 1, "view", _ts(9)),
        (2, 1, "click", _ts(10)),
        (3, 1, "view", _ts(11)),
        (4, 1, "click", _ts(12)),
        (5, 2, "view", _ts(9)),
        (6, 2, "purchase", _ts(10)),
        (7, 3, "view", _ts(9)),  # single event: no transition
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        (r["src_type"], r["dst_type"]): (r["n_trans"], r["n_src"], r["p_micro"])
        for r in event_transitions(df).collect()
    }
    # view->click x2, click->view x1, view->purchase x1
    assert got[("view", "click")] == (2, 3, 666666)  # 2/3
    assert got[("view", "purchase")] == (1, 3, 333333)
    assert got[("click", "view")] == (1, 1, 1000000)
    assert len(got) == 3


def test_event_transitions_matches_duckdb(spark):
    import duckdb

    from nlp_to_nosql_spark.operators.funnel import (
        event_transitions,
        transitions_sql,
    )
    from nlp_to_nosql_spark.sources.catalog import register_tables

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata not present")
    ev = register_tables(spark, sf_dir)["events"]
    got = {tuple(r[:2]): tuple(r[2:]) for r in event_transitions(ev).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = {tuple(r[:2]): tuple(r[2:]) for r in con.execute(transitions_sql()).fetchall()}
    assert got == want and len(got) >= 20
