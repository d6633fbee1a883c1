"""Property tests: the eval metric layers vs pure-Python models.

classification_metrics and calibration_table are exact-integer
relational plans; these pin them to ~10-line Python models over
randomized prediction/truth tables — covering the edge lattice the
example tests don't enumerate (empty groups, all-one-class groups,
zero denominators, scores clamping at both band edges, ids present on
only one side of the join).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nlp_to_nosql_spark.operators.evals import (
    calibration_table,
    classification_metrics,
)

# ids drawn from a small range so pred/truth overlap partially;
# unmatched ids must drop out of the inner join
pred_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.booleans(),
        st.sampled_from(["g1", "g2", "g3"]),
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],
)
truth_st = st.lists(
    st.tuples(st.integers(min_value=0, max_value=15), st.booleans()),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],
)
scores_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],
)


def _py_confusion(preds, truths):
    tmap = dict(truths)
    out: dict[str, list[int]] = {}
    for pid, p, g in preds:
        if pid not in tmap:
            continue
        t = tmap[pid]
        c = out.setdefault(g, [0, 0, 0, 0])  # tp fp fn tn
        c[0] += p and t
        c[1] += p and not t
        c[2] += (not p) and t
        c[3] += (not p) and (not t)
    return out


def _ratio(num: int, den: int) -> int:
    return (num * 1_000_000) // den if den > 0 else 0


@pytest.mark.usefixtures("spark")
@given(pred_st, truth_st)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_classification_matches_python_model(spark, preds, truths):
    p = spark.createDataFrame(
        preds, "doc_id long, pred boolean, g string"
    )
    t = spark.createDataFrame(truths, "doc_id long, label boolean")
    got = {
        r["g"]: (
            r["tp"], r["fp"], r["fn"], r["tn"],
            r["precision_micro"], r["recall_micro"],
            r["f1_micro"], r["accuracy_micro"],
        )
        for r in classification_metrics(p, t, group_cols=["g"]).collect()
    }
    want = {}
    for g, (tp, fp, fn, tn) in _py_confusion(preds, truths).items():
        want[g] = (
            tp, fp, fn, tn,
            _ratio(tp, tp + fp),
            _ratio(tp, tp + fn),
            _ratio(2 * tp, 2 * tp + fp + fn),
            _ratio(tp + tn, tp + fp + fn + tn),
        )
    assert got == want


@pytest.mark.usefixtures("spark")
@given(scores_st, truth_st)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_calibration_matches_python_model(spark, scores, truths):
    lo, hi, width = -40, 40, 20
    s = spark.createDataFrame(scores, "doc_id long, score_sum long")
    t = spark.createDataFrame(truths, "doc_id long, label boolean")
    got = {
        r["band"]: (r["band_lo"], r["n"], r["n_pos"], r["pos_rate_micro"])
        for r in calibration_table(
            s, t, band_width=width, lo=lo, hi=hi
        ).collect()
    }
    tmap = dict(truths)
    bands: dict[int, list[int]] = {}
    for sid, sc in scores:
        if sid not in tmap:
            continue
        band = (max(lo, min(hi, sc)) - lo) // width
        c = bands.setdefault(band, [0, 0])
        c[0] += 1
        c[1] += tmap[sid]
    want = {
        b: (b * width + lo, n, npos, _ratio(npos, n))
        for b, (n, npos) in bands.items()
    }
    assert got == want
