"""Property test: bm25_topk vs a pure-Python BM25 model.

The oracle harness checks BM25 against DuckDB on one fixed corpus and
query set; this pins the Column plan to a ~30-line Python model over
RANDOMIZED corpora and queries — tie-breaks at equal scores, tokens
absent from the corpus, repeated query terms (must not double-count),
empty documents (count toward N and avgdl but never match), and k
larger than the candidate set.

The model reproduces the implementation's float discipline exactly:
every per-term double op in the same association, floored to integer
micros BEFORE the per-document sum.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nlp_to_nosql_spark.operators.terms import bm25_topk

WORDS = ["fast", "merge", "stream", "the", "zz", "q"]

docs_st = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=8,
)
queries_st = st.lists(
    st.tuples(st.sampled_from(["q1", "q2"]), st.sampled_from(WORDS + ["absent"])),
    min_size=1,
    max_size=5,
)


def _py_bm25(
    docs: list[tuple[int, str]],
    qterms: list[tuple[str, str]],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> set[tuple[str, int, int, int]]:
    toks = {
        i: [t for t in re.sub(r"\s+", " ", txt.strip().lower()).split(" ") if t]
        for i, txt in docs
    }
    n_docs = len(docs)
    total = sum(len(ts) for ts in toks.values())
    avgdl = total / n_docs
    tf = {i: Counter(ts) for i, ts in toks.items()}
    q = sorted(set(qterms))
    df = {
        tok: sum(1 for i in tf if tf[i][tok] > 0)
        for _, tok in q
    }
    scores: dict[tuple[str, int], int] = {}
    for qid, tok in q:
        for i in tf:
            f = tf[i][tok]
            if not f:
                continue
            idf = math.log(
                1.0 + ((n_docs - df[tok]) + 0.5) / (df[tok] + 0.5)
            )
            norm = f + k1 * (1.0 - b + b * (len(toks[i]) / avgdl))
            micro = math.floor(idf * ((f * (k1 + 1.0)) / norm) * 1000000.0)
            scores[(qid, i)] = scores.get((qid, i), 0) + micro
    out: set[tuple[str, int, int, int]] = set()
    by_q: dict[str, list[tuple[int, int]]] = {}
    for (qid, i), s in scores.items():
        by_q.setdefault(qid, []).append((i, s))
    for qid, rows in by_q.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        for rk, (i, s) in enumerate(rows[:k], start=1):
            out.add((qid, rk, i, s))
    return out


@pytest.mark.usefixtures("spark")
@given(docs_st, queries_st, st.sampled_from([1, 3, 10]))
@settings(
    max_examples=15,
    deadline=None,
    # libm-floor pin (score_micro floors an idf·tf chain with ln):
    # derandomized per test_float_floor_property's docstring — a
    # 1-ulp libm divergence must fail deterministically, not flake
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bm25_matches_python_model(spark, texts, qterms, k):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    qt = spark.createDataFrame(qterms, "query_id string, token string")
    got = {
        (r["query_id"], r["rk"], r["doc_id"], r["score_micro"])
        for r in bm25_topk(df, qt, "doc_id", "text", k=k).collect()
    }
    assert got == _py_bm25(docs, qterms, k)
