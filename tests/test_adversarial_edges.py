"""Hostile-input edge fixtures for the operators added late in round 5
(pipe5 composition, drift1, seq1, sample3, scd2 snapshot): empty
sources, single keys, all-tie timestamps, and NULL keys — the inputs a
100 TB corpus WILL contain somewhere, exercised on purpose-built tiny
frames so each semantics claim is pinned independently of the parquet
test data.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

TS = datetime.datetime

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


# ---------------------------------------------------------------------------
# seq1 — event_transitions
# ---------------------------------------------------------------------------


def test_transitions_empty_and_singletons(spark):
    from nlp_to_nosql_spark.operators.funnel import event_transitions

    assert event_transitions(_ev(spark, [])).count() == 0
    # One event per user: lead() is NULL everywhere -> no transitions.
    rows = [
        (1, 10, "view", TS(2024, 1, 1), 1.0),
        (2, 20, "purchase", TS(2024, 1, 2), 2.0),
    ]
    assert event_transitions(_ev(spark, rows)).count() == 0


def test_transitions_all_ties_ordered_by_tiebreak(spark):
    """Equal timestamps: the per-user order is the unique event_id, so
    the chain is fully determined (1->2->3)."""
    from nlp_to_nosql_spark.operators.funnel import event_transitions

    t = TS(2024, 1, 1)
    rows = [
        (3, 10, "purchase", t, 1.0),
        (1, 10, "view", t, 1.0),
        (2, 10, "click", t, 1.0),
    ]
    got = {
        (r["src_type"], r["dst_type"]): (r["n_trans"], r["p_micro"])
        for r in event_transitions(_ev(spark, rows)).collect()
    }
    assert got == {
        ("view", "click"): (1, 1000000),
        ("click", "purchase"): (1, 1000000),
    }


def test_transitions_null_user_and_null_type(spark):
    """NULL user_id is one partition (all NULL users share a chain, in
    both engines); NULL event_type appears as a src/dst value like any
    other.  Pinned against the DuckDB twin on the same rows."""
    import duckdb

    from nlp_to_nosql_spark.operators.funnel import (
        event_transitions,
        transitions_sql,
    )

    rows = [
        (1, None, "view", TS(2024, 1, 1), 1.0),
        (2, None, None, TS(2024, 1, 2), 1.0),
        (3, None, "click", TS(2024, 1, 3), 1.0),
        (4, 7, "view", TS(2024, 1, 1), 1.0),
        (5, 7, "view", TS(2024, 1, 2), 1.0),
    ]
    got = {
        (r["src_type"], r["dst_type"]): (r["n_trans"], r["n_src"], r["p_micro"])
        for r in event_transitions(_ev(spark, rows)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT, "
        "event_type VARCHAR, ts TIMESTAMP, value DOUBLE)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows
    )
    want = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(transitions_sql()).fetchall()
    }
    assert got == want
    # A NULL dst_type is indistinguishable from end-of-chain (lead()'s
    # NULL) and is filtered with it; a NULL src_type can't match its
    # marginal row in the equi-join.  Both engines drop both identically
    # — the NULL-user chain contributes no matrix rows here.
    assert got == {("view", "view"): (1, 1, 1000000)}


# ---------------------------------------------------------------------------
# funnel (pipe5 ingredient) — strict-advance under ties
# ---------------------------------------------------------------------------


def test_funnel_all_ties_do_not_advance(spark):
    """view/click/purchase all at the same instant: strict > means the
    funnel stops after the view."""
    from nlp_to_nosql_spark.operators.funnel import funnel_stages

    t = TS(2024, 1, 1)
    rows = [
        (1, 10, "view", t, 1.0),
        (2, 10, "click", t, 1.0),
        (3, 10, "purchase", t, 1.0),
    ]
    r = funnel_stages(_ev(spark, rows)).collect()[0]
    assert r["funnel_stage"] == 1
    assert r["view_ts"] == t and r["click_ts"] is None


def test_funnel_empty_and_no_stage_events(spark):
    from nlp_to_nosql_spark.operators.funnel import funnel_stages

    assert funnel_stages(_ev(spark, [])).count() == 0
    rows = [(1, 10, "scroll", TS(2024, 1, 1), 1.0)]
    r = funnel_stages(_ev(spark, rows)).collect()[0]
    assert r["funnel_stage"] == 0 and r["view_ts"] is None


# ---------------------------------------------------------------------------
# sample3 — consistent_key_sample
# ---------------------------------------------------------------------------


def test_consistent_sample_rate_bounds_and_nulls(spark):
    from nlp_to_nosql_spark.operators.curation import consistent_key_sample

    df = spark.createDataFrame(
        [(i,) for i in range(200)] + [(None,)], "k long"
    )
    assert consistent_key_sample(df, "k", 0.0).count() == 0
    # rate=1 keeps every NON-NULL key; a NULL key hashes to NULL and the
    # predicate drops it in Spark and DuckDB alike — a NULL join key
    # could never join anyway, so the slice loses nothing joinable.
    assert consistent_key_sample(df, "k", 1.0).count() == 200
    assert consistent_key_sample(spark.createDataFrame([], "k long"), "k", 0.5).count() == 0


def test_consistent_sample_joinability_and_determinism(spark):
    """The defining property: two tables sampled at the same rate+seed
    keep EXACTLY the same key set (the full join subgraph), and a rerun
    returns the identical slice."""
    from nlp_to_nosql_spark.operators.curation import consistent_key_sample

    left = spark.createDataFrame([(i,) for i in range(500)], "k long")
    right = spark.createDataFrame(
        [(i, i * 10) for i in range(500)], "k long, payload long"
    )
    ks_l = {r["k"] for r in consistent_key_sample(left, "k", 0.2).collect()}
    ks_r = {r["k"] for r in consistent_key_sample(right, "k", 0.2).collect()}
    assert ks_l == ks_r and 0 < len(ks_l) < 500
    again = {r["k"] for r in consistent_key_sample(left, "k", 0.2).collect()}
    assert again == ks_l
    # A different seed samples a different (still consistent) key set.
    other = {
        r["k"] for r in consistent_key_sample(left, "k", 0.2, seed=5).collect()
    }
    assert other != ks_l


# ---------------------------------------------------------------------------
# drift1 — source_divergence
# ---------------------------------------------------------------------------

DOC_SCHEMA = "doc_id long, text string, source string"


def test_divergence_empty_single_source_null_text(spark):
    from nlp_to_nosql_spark.operators.terms import source_divergence

    empty = spark.createDataFrame([], DOC_SCHEMA)
    assert source_divergence(empty).count() == 0
    one = spark.createDataFrame(
        [(1, "alpha beta", "crawl")], DOC_SCHEMA
    )
    assert source_divergence(one).count() == 0  # no pair to compare
    nulls = spark.createDataFrame(
        [(1, None, "a"), (2, None, "b")], DOC_SCHEMA
    )
    # NULL text coalesces to "" -> no tokens -> no counts -> no pairs.
    assert source_divergence(nulls).count() == 0


def test_divergence_identical_distributions_is_zero(spark):
    from nlp_to_nosql_spark.operators.terms import source_divergence

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma", "a"),
            (2, "alpha beta beta gamma", "b"),
        ],
        DOC_SCHEMA,
    )
    rows = source_divergence(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_a"], r["src_b"]) == ("a", "b")
    assert r["chi2_micro"] == 0 and r["n_terms"] == 3


def test_divergence_disjoint_vocab_matches_duckdb(spark):
    """Fully disjoint vocabularies (maximal drift) — exact twin check,
    including the o_a+o_b>0 sparsity filter on a tiny hostile corpus."""
    import duckdb

    from nlp_to_nosql_spark.operators.terms import (
        source_divergence,
        source_divergence_sql,
    )

    data = [
        (1, "xx xx yy", "a"),
        (2, "zz ww ww ww", "b"),
    ]
    docs = spark.createDataFrame(data, DOC_SCHEMA)
    got = {
        (r["src_a"], r["src_b"]): (r["chi2_micro"], r["n_terms"])
        for r in source_divergence(docs, top_v=10).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", data)
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(source_divergence_sql(top_v=10)).fetchall()
    }
    assert got == want and len(got) == 1


# ---------------------------------------------------------------------------
# scd2 — snapshot boundaries
# ---------------------------------------------------------------------------


def _intervals(spark, rows):
    from nlp_to_nosql_spark.operators.changelog import scd2_intervals

    return scd2_intervals(
        _ev(spark, rows), "user_id", "event_type", "ts", "event_id"
    )


def test_scd2_snapshot_before_birth_is_empty(spark):
    from nlp_to_nosql_spark.operators.changelog import scd2_snapshot

    rows = [(1, 10, "a", TS(2024, 1, 5), 1.0)]
    iv = _intervals(spark, rows)
    assert (
        scd2_snapshot(iv, "user_id", "event_type", "2024-01-01 00:00:00").count()
        == 0
    )


def test_scd2_snapshot_exact_boundary_half_open(spark):
    """At exactly a change timestamp the NEW segment is active
    (valid_from <= at < valid_to): half-open intervals, no double
    membership and no gap."""
    from nlp_to_nosql_spark.operators.changelog import scd2_snapshot

    rows = [
        (1, 10, "a", TS(2024, 1, 1), 1.0),
        (2, 10, "b", TS(2024, 1, 5), 1.0),
    ]
    iv = _intervals(spark, rows)
    at_change = scd2_snapshot(
        iv, "user_id", "event_type", "2024-01-05 00:00:00"
    ).collect()
    assert len(at_change) == 1 and at_change[0]["event_type"] == "b"
    assert at_change[0]["version"] == 2


def test_scd2_all_ties_and_null_attr(spark):
    """Same-instant observations order by event_id (total order), NULL
    attr is a real segment, and the still-open segment answers 'now'."""
    from nlp_to_nosql_spark.operators.changelog import scd2_snapshot

    t = TS(2024, 1, 1)
    rows = [
        (2, 10, None, t, 1.0),  # second observation at t (by id)
        (1, 10, "a", t, 1.0),   # first observation at t
        (3, 10, "a", TS(2024, 1, 2), 1.0),
    ]
    iv = _intervals(spark, rows).collect()
    assert [(r["event_type"], r["version"]) for r in sorted(iv, key=lambda r: r["version"])] == [
        ("a", 1),
        (None, 2),
        ("a", 3),
    ]
    now = scd2_snapshot(
        _intervals(spark, rows), "user_id", "event_type", "2024-06-01 00:00:00"
    ).collect()
    assert len(now) == 1 and now[0]["event_type"] == "a" and now[0]["version"] == 3


def test_scd2_null_key_forms_its_own_history(spark):
    """A NULL key partitions into one group (Spark and DuckDB window
    semantics agree) rather than exploding into per-row groups."""
    rows = [
        (1, None, "a", TS(2024, 1, 1), 1.0),
        (2, None, "b", TS(2024, 1, 2), 1.0),
    ]
    iv = _intervals(spark, rows).collect()
    assert sorted((r["event_type"], r["version"]) for r in iv) == [
        ("a", 1),
        ("b", 2),
    ]


# ---------------------------------------------------------------------------
# pipe5 — the latest ⋈ funnel ⋈ cohort composition
# ---------------------------------------------------------------------------


def _profile(spark, rows):
    """The pipe5 composition (``__spark_entry__._q_user_profile``) on an
    in-memory event frame: CDC latest state ⋈ funnel stage ⋈ cohort
    week, inner-joined on user_id."""
    from nlp_to_nosql_spark.functions.time import epoch_us
    from nlp_to_nosql_spark.operators.changelog import latest_wins
    from nlp_to_nosql_spark.operators.funnel import WEEK_US, funnel_stages

    ev = _ev(spark, rows)
    latest = latest_wins(ev, ["user_id"], ["ts", "event_id"], ["value"]).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )
    fun = funnel_stages(ev).select("user_id", "funnel_stage")
    coh = (
        ev.groupBy("user_id")
        .agg(epoch_us(F.min("ts")).alias("_fus"))
        .select("user_id", F.expr(f"_fus div {WEEK_US}").alias("cohort_week"))
    )
    return latest.join(fun, "user_id").join(coh, "user_id")


def test_pipe5_empty_single_user_and_ties(spark):
    assert _profile(spark, []).count() == 0

    t = TS(2024, 1, 1)
    rows = [
        (2, 10, "view", t, 5.0),   # tie on ts -> id 2 wins latest
        (1, 10, "view", t, 3.0),
    ]
    got = _profile(spark, rows).collect()
    assert len(got) == 1
    r = got[0]
    assert r["last_event_id"] == 2 and r["last_value"] == 5.0
    assert r["funnel_stage"] == 1
    assert r["cohort_week"] == (t - TS(1970, 1, 1)) // datetime.timedelta(weeks=1)


def test_pipe5_null_user_drops_from_profile(spark):
    """Every branch carries the NULL-user group, but the inner equi-join
    on user_id cannot match NULL=NULL — the profile table keys real
    users only, and each exactly once."""
    rows = [
        (1, None, "view", TS(2024, 1, 1), 1.0),
        (2, 7, "view", TS(2024, 1, 1), 1.0),
        (3, 7, "click", TS(2024, 1, 2), 2.0),
    ]
    out = _profile(spark, rows).collect()
    assert [r["user_id"] for r in out] == [7]
    assert out[0]["funnel_stage"] == 2 and out[0]["last_event_id"] == 3


# ---------------------------------------------------------------------------
# round-6 additions: snapshot_diff, cluster_representatives
# ---------------------------------------------------------------------------


def test_snapshot_diff_statuses_and_null_fp(spark):
    """Marker-column membership + NULL-safe fingerprint compare: a NULL
    fp (NULL-text doc) is a VALUE — NULL==NULL reads unchanged,
    NULL→text reads changed — and empty snapshots diff cleanly."""
    from nlp_to_nosql_spark.operators.changelog import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, None), (5, "e")],
        "doc_id long, fp string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None), (4, "now-text"), (6, "f")],
        "doc_id long, fp string",
    )
    got = {r["status"]: r["n_docs"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        "unchanged": 2,  # 1 (a=a), 3 (NULL=NULL)
        "changed": 2,    # 2 (b→B), 4 (NULL→text)
        "removed": 1,    # 5
        "added": 1,      # 6
    }

    empty = spark.createDataFrame([], "doc_id long, fp string")
    assert snapshot_diff(empty, empty).count() == 0
    only_added = {
        r["status"]: r["n_docs"] for r in snapshot_diff(empty, new).collect()
    }
    assert only_added == {"added": 5}


def test_snapshot_diff_matches_duckdb_twin(spark):
    import duckdb

    from nlp_to_nosql_spark.operators.changelog import (
        snapshot_diff,
        snapshot_diff_sql,
    )

    rows_a = [(1, "x"), (2, None), (3, "z")]
    rows_b = [(2, None), (3, "Z"), (4, "w")]
    a = spark.createDataFrame(rows_a, "doc_id long, fp string")
    b = spark.createDataFrame(rows_b, "doc_id long, fp string")
    got = {r["status"]: r["n_docs"] for r in snapshot_diff(a, b).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE ta (doc_id BIGINT, fp VARCHAR)")
    con.execute("CREATE TABLE tb (doc_id BIGINT, fp VARCHAR)")
    con.executemany("INSERT INTO ta VALUES (?, ?)", rows_a)
    con.executemany("INSERT INTO tb VALUES (?, ?)", rows_b)
    want = dict(
        con.execute(
            snapshot_diff_sql(
                "SELECT doc_id, fp FROM ta", "SELECT doc_id, fp FROM tb"
            )
        ).fetchall()
    )
    assert got == want


def test_cluster_representatives_ties_and_min_members(spark):
    """Arg-max semantics: highest score wins, exact ties go to the MIN
    id, unscored members don't count, and min_members prunes
    singletons."""
    from nlp_to_nosql_spark.operators.graph import cluster_representatives

    labels = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 1), (20, 2), (21, 2), (30, 3)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        # cluster 1: tie at 0.9 between 11 and 12 -> 11 wins (min id);
        # cluster 2: member 21 unscored -> 20 wins by default, n=1;
        # cluster 3: singleton.
        [(10, 0.5), (11, 0.9), (12, 0.9), (20, 0.1), (30, 1.0)],
        "doc_id long, score double",
    )
    got = {
        r["cluster_id"]: (r["rep_id"], r["rep_score"], r["n_members"])
        for r in cluster_representatives(labels, scores).collect()
    }
    assert got == {1: (11, 0.9, 3), 2: (20, 0.1, 1), 3: (30, 1.0, 1)}

    pruned = {
        r["cluster_id"]
        for r in cluster_representatives(
            labels, scores, min_members=2
        ).collect()
    }
    assert pruned == {1}
    assert (
        cluster_representatives(
            spark.createDataFrame([], "doc_id long, cluster_id long"),
            scores,
        ).count()
        == 0
    )


def test_cluster_representatives_string_ids(spark):
    """Round-6 advice: the tie-break must work for NON-numeric ids (the
    old ``-id`` cast string ids to NULL rep_id).  Ties on score still
    break to the min id, now lexicographically."""
    from nlp_to_nosql_spark.operators.graph import cluster_representatives

    labels = spark.createDataFrame(
        [("docB", 1), ("docA", 1), ("docC", 2)],
        "doc_id string, cluster_id long",
    )
    scores = spark.createDataFrame(
        [("docA", 5.0), ("docB", 5.0), ("docC", 1.0)],
        "doc_id string, score double",
    )
    got = {
        r["cluster_id"]: (r["rep_id"], r["rep_score"])
        for r in cluster_representatives(labels, scores).collect()
    }
    assert got == {1: ("docA", 5.0), 2: ("docC", 1.0)}


# ---------------------------------------------------------------------------
# round-7 families: sketches, streaming folds, hard negatives
# ---------------------------------------------------------------------------

def test_sketches_on_hostile_text(spark):
    """NULL text, empty text, and whitespace-only text contribute zero
    tokens — the sketches must not crash or count phantom tokens."""
    from nlp_to_nosql_spark.operators.sketch import (
        cms_cells,
        hll_registers,
        tokens_of,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real tok")],
        "doc_id long, text string",
    )
    assert tokens_of(docs).count() == 2  # only doc 4's tokens
    assert hll_registers(docs).count() == 2
    total = sum(r["cnt"] for r in cms_cells(docs).collect())
    assert total == 2 * 4  # 2 tokens x depth 4 cells


def test_sketches_on_empty_corpus(spark):
    from nlp_to_nosql_spark.operators.sketch import (
        cms_heavy_hitters,
        hll_estimate,
        hll_registers,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert hll_registers(empty).count() == 0
    assert cms_heavy_hitters(empty).count() == 0
    # all-zero registers -> linear-counting branch -> exactly 0
    assert hll_estimate([], m=64) == 0


def test_hll_overlap_empty_sides(spark):
    from nlp_to_nosql_spark.operators.sketch import hll_overlap

    vals = spark.createDataFrame(
        [(f"tok{i}",) for i in range(500)], "tok string"
    )
    empty = spark.createDataFrame([], "tok string")
    # empty vs non-empty: a-side NDV 0, union == b, no overlap
    r = hll_overlap(empty, vals, "tok").collect()[0]
    assert r["ndv_a"] == 0
    assert r["ndv_b"] == r["ndv_union"] > 0
    assert r["ndv_intersect"] == 0 and r["jaccard_micro"] == 0
    # both empty: one all-zero row, jaccard 0 (no divide-by-zero)
    r2 = hll_overlap(empty, empty, "tok").collect()[0]
    assert (
        r2["ndv_a"], r2["ndv_b"], r2["ndv_union"],
        r2["ndv_intersect"], r2["jaccard_micro"],
    ) == (0, 0, 0, 0, 0)


def test_grouped_hll_and_eval_empty_inputs(spark):
    from nlp_to_nosql_spark.operators.evals import (
        calibration_table,
        classification_metrics,
    )
    from nlp_to_nosql_spark.operators.sketch import hll_ndv_by

    empty_vals = spark.createDataFrame([], "k string, tok string")
    assert hll_ndv_by(empty_vals, ["k"], "tok").count() == 0
    pred = spark.createDataFrame([], "doc_id long, pred boolean")
    truth = spark.createDataFrame([], "doc_id long, label boolean")
    # ungrouped: one all-zero confusion row (global agg over empty);
    # all ratios hit the zero-denominator guard
    row = classification_metrics(pred, truth).collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (0, 0, 0, 0)
    assert row["precision_micro"] == row["f1_micro"] == 0
    # grouped: no groups -> no rows
    predg = spark.createDataFrame([], "doc_id long, pred boolean, g string")
    assert classification_metrics(pred=predg, truth=truth, group_cols=["g"]).count() == 0
    scored = spark.createDataFrame([], "doc_id long, score_sum long")
    assert calibration_table(scored, truth).count() == 0


def test_hll_accumulate_stream_empty_corpus(spark):
    from nlp_to_nosql_spark.streaming.replay import replay_hll_accumulate

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = replay_hll_accumulate(spark, empty, tag="hlledge")
    assert out.count() == 0


def test_hard_negative_topk_edges(spark):
    from nlp_to_nosql_spark.operators.similarity import hard_negative_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], "a"), (2, [0.9, 0.1], "a"), (3, [0.0, 1.0], "a")],
        "vec_id long, embedding array<float>, label string",
    )
    # query label covers the whole corpus: no negatives exist
    assert (
        hard_negative_topk(emb, [(0, [1.0, 0.0], "a")], k=2).count() == 0
    )
    # empty query list is a caller bug, rejected up front
    with pytest.raises(ValueError):
        hard_negative_topk(emb, [])
