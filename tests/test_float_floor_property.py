"""Property pins for every floor-of-float-expression site the r12 audit
flagged (VERDICT r12 "next round" #2): each operator whose contract
value passes through ``floor(f(x) · scale)`` with ``f`` involving libm
or chained IEEE ops is pinned against an O(10-line) pure-Python model
over randomized inputs that DELIBERATELY include the exact-boundary
cases (ratio-equal dims, equal counts, uniform distributions) where the
r12 DSIR incident showed chained-ln association noise flips floors
between JVM and Python libm.

The repo discipline these tests enforce:

* a floored float expression may contain AT MOST ONE ln per side of a
  single difference, each ln's argument an exact integer (or an exact
  product of integers, cast to double) — so a mathematically-exact
  ratio of 1 yields bit-identical arguments and an exact 0 everywhere;
* pure-IEEE chains (mul/div/sub, no libm) are allowed any shape — every
  IEEE op is correctly rounded, hence bit-deterministic across engines
  (colloc lift, drift chi-square) — but still get a pin here because
  the Python model doubles as the shape's documentation.

Sites covered: mm6 aspect buckets (restructured to product form this
round), colloc1 lift (IEEE-only), drift1 chi-square terms (IEEE-only),
lm5's final two-ln lp floor (exact-BIGINT args).  DSIR's own pin lives
in ``test_selection_property.py``.

DERANDOMIZATION (r13 VERDICT "next round" #3): every pin whose model
floors a LIBM value (``ln``) runs ``derandomize=True``.  ``ln`` is not
required by IEEE 754 to be correctly rounded, so these pins rest on
JVM ``Math.log``, CPython ``math.log``, and DuckDB ``ln`` agreeing to
the ulp on the same double — empirically true on this host for 13
rounds, but a 1-ulp divergence on a future host must surface as a
DETERMINISTIC failure pointing at the exact example, never as a
seed-dependent suite flake (the r12 failure mode).  The pure-IEEE
pins (colloc lift, drift chi-square: mul/div/sub only, all correctly
rounded by the standard and hence bit-deterministic across engines)
keep full randomization — there is nothing host-dependent to flake.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nlp_to_nosql_spark.operators.multimodal import (
    DEFAULT_ASPECT_BUCKETS,
    aspect_bucket_plan,
)
from nlp_to_nosql_spark.operators.terms import (
    bigram_collocations,
    source_divergence,
)

MICRO = 1_000_000

# ---------------------------------------------------------------------------
# mm6: aspect buckets — |ln(w·bh) − ln(h·bw)| product form
# ---------------------------------------------------------------------------

_random_dims = st.tuples(
    st.integers(min_value=1, max_value=8192),
    st.integers(min_value=1, max_value=8192),
)
# dims that EQUAL a bucket aspect with different integers — the exact-0
# knife edge the four-ln shape got wrong (e.g. 1152×896 vs bucket
# 576:448): w·bh = h·bw exactly, so the score must be exactly 0.
_ratio_hits = st.tuples(
    st.sampled_from(DEFAULT_ASPECT_BUCKETS),
    st.integers(min_value=1, max_value=16),
).map(lambda t: (t[0][0] * t[1], t[0][1] * t[1]))
dims_st = st.lists(
    st.one_of(_random_dims, _ratio_hits), min_size=1, max_size=12
)


def _py_aspect(w: int, h: int):
    best = None
    for i, (bw, bh) in enumerate(DEFAULT_ASPECT_BUCKETS):
        s = math.floor(
            abs(math.log(float(w * bh)) - math.log(float(h * bw)))
            * float(MICRO)
        )
        if best is None or (s, i) < (best[0], best[1]):
            best = (s, i, bw, bh)
    return (best[2], best[3], best[0])


@pytest.mark.usefixtures("spark")
@given(dims_st)
@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,  # libm-floor pin: see module docstring
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_aspect_bucket_matches_python_model(spark, dims):
    media = spark.createDataFrame(
        [(i, "image", {"width": w, "height": h})
         for i, (w, h) in enumerate(dims)],
        "media_id long, kind string, meta struct<width: int, height: int>",
    )
    got = {
        r["media_id"]: (r["bucket_w"], r["bucket_h"], r["score_micro"])
        for r in aspect_bucket_plan(media).collect()
    }
    want = {i: _py_aspect(w, h) for i, (w, h) in enumerate(dims)}
    assert got == want
    # every ratio-equal image must score EXACTLY 0 — the knife edge
    for i, (w, h) in enumerate(dims):
        if any(w * bh == h * bw for bw, bh in DEFAULT_ASPECT_BUCKETS):
            assert got[i][2] == 0


# ---------------------------------------------------------------------------
# colloc1: lift — pure-IEEE mul/mul/div/mul/floor, no libm
# ---------------------------------------------------------------------------

_tok = st.sampled_from(["a", "b", "c", "d"])
texts_st = st.lists(
    st.lists(_tok, min_size=0, max_size=10).map(" ".join),
    min_size=1,
    max_size=6,
)


def _py_colloc(texts, min_count):
    pairs = Counter()
    for t in texts:
        ws = [w for w in t.split(" ") if w]
        pairs.update(zip(ws, ws[1:]))
    fx, fy = Counter(), Counter()
    for (a, b), c in pairs.items():
        fx[a] += c
        fy[b] += c
    n = sum(pairs.values())
    return {
        (a, b): (
            c,
            fx[a],
            fy[b],
            n,
            math.floor(
                (float(c) * float(n)) / (float(fx[a]) * float(fy[b]))
                * float(MICRO)
            ),
        )
        for (a, b), c in pairs.items()
        if c >= min_count
    }


@pytest.mark.usefixtures("spark")
@given(texts_st, st.integers(min_value=1, max_value=3))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_colloc_lift_matches_python_model(spark, texts, min_count):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["w1"], r["w2"]): (
            r["n_pair"],
            r["n_first"],
            r["n_second"],
            r["n_bigrams"],
            r["lift_micro"],
        )
        for r in bigram_collocations(df, min_count=min_count).collect()
    }
    assert got == _py_colloc(texts, min_count)


# ---------------------------------------------------------------------------
# drift1: chi-square — per-term IEEE chain floored BEFORE the BIGINT sum
# ---------------------------------------------------------------------------

grouped_st = st.lists(
    st.tuples(st.sampled_from(["s1", "s2", "s3"]),
              st.lists(_tok, min_size=1, max_size=8).map(" ".join)),
    min_size=2,
    max_size=10,
)


def _py_divergence(rows, top_v):
    tf = Counter()
    for src, text in rows:
        for w in text.split(" "):
            if w:
                tf[(src, w)] += 1
    by_tok = Counter()
    for (_, w), c in tf.items():
        by_tok[w] += c
    vocab = [
        w for w, _ in sorted(by_tok.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:top_v]
    vset = set(vocab)
    totals = Counter()
    for (s, w), c in tf.items():
        if w in vset:
            totals[s] += c
    out = {}
    srcs = sorted(totals)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            chi, n_terms = 0, 0
            for w in vset:
                oa, ob = tf.get((sa, w), 0), tf.get((sb, w), 0)
                if oa + ob == 0:
                    continue
                t, nn = float(oa + ob), float(totals[sa] + totals[sb])
                ea = (float(totals[sa]) * t) / nn
                eb = (float(totals[sb]) * t) / nn
                da, db = float(oa) - ea, float(ob) - eb
                term = (da * da) / ea + (db * db) / eb
                chi += math.floor(term * float(MICRO))
                n_terms += 1
            out[(sa, sb)] = (chi, n_terms)
    return out


@pytest.mark.usefixtures("spark")
@given(grouped_st, st.integers(min_value=2, max_value=6))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_divergence_matches_python_model(spark, rows, top_v):
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["src_a"], r["src_b"]): (r["chi2_micro"], r["n_terms"])
        for r in source_divergence(df, top_v=top_v).collect()
    }
    assert got == _py_divergence(rows, top_v)


# ---------------------------------------------------------------------------
# lm5: the final lp floor — floor((ln(p) − ln(S)) · 1e6) on exact BIGINTs
# ---------------------------------------------------------------------------

S_NANO = 10**9
# nano probabilities spanning the full range, INCLUDING p = S (true
# value exactly 0 — bit-identical args, must floor to 0) and p = 1
nanos_st = st.lists(
    st.one_of(
        st.integers(min_value=1, max_value=S_NANO),
        st.just(S_NANO),
        st.just(1),
    ),
    min_size=1,
    max_size=32,
)


@pytest.mark.usefixtures("spark")
@given(nanos_st)
@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,  # libm-floor pin: see module docstring
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_kn_lp_floor_matches_python_model(spark, nanos):
    """Pins lm5's ONLY float op (curation._kn_score_pool's scored
    select) — the two-ln exact-BIGINT difference — across magnitudes
    including the exact-1 probability."""
    df = spark.createDataFrame([(p,) for p in nanos], "p long")
    got = [
        r["lp_micro"]
        for r in df.select(
            F.expr(
                "CAST(FLOOR((ln(CAST(CASE WHEN p < 1 THEN 1 ELSE p END "
                f"AS DOUBLE)) - ln(CAST({S_NANO} AS DOUBLE))) "
                "* 1000000) AS BIGINT)"
            ).alias("lp_micro")
        ).collect()
    ]
    want = [
        math.floor(
            (math.log(float(max(p, 1))) - math.log(float(S_NANO))) * MICRO
        )
        for p in nanos
    ]
    assert got == want
    assert all(
        g == 0 for g, p in zip(got, nanos) if p == S_NANO
    )
