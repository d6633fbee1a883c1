"""Property test: incremental_new_docs vs pure-Python set difference.

The Bloom machinery (static or auto-sized filter, literal or broadcast
probe kernel) is an ACCELERATION only — the result must always equal
``batch rows whose normalized text is absent from the corpus``.  This
pins that over randomized corpora/batches at three filter configs:
a 64-bit filter (saturated — nearly every probe is a false positive,
so the exact-verify anti join carries the result), the 2^16 default,
and the auto-sizer (``m_bits=None``).  Empty frames are covered by the
dedicated edge tests.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nlp_to_nosql_spark.operators.dedup import incremental_new_docs

WORDS = ["alpha", "beta", "GAMMA", "x", "yz"]

texts_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=4).map(
    " ".join
)
corpus_st = st.lists(texts_st, min_size=1, max_size=8)
batch_st = st.lists(texts_st, min_size=1, max_size=8)


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.strip().lower())


@pytest.mark.usefixtures("spark")
@given(corpus_st, batch_st, st.sampled_from([64, 1 << 16, None]))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_equals_set_difference(spark, corpus, batch, m_bits):
    cdf = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    # batch ids offset so they never collide with corpus ids
    bdf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(batch)],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in incremental_new_docs(bdf, cdf, m_bits=m_bits).collect()
    )
    seen = {_norm(t) for t in corpus}
    want = sorted(
        1000 + i for i, t in enumerate(batch) if _norm(t) not in seen
    )
    assert got == want


# ---------------------------------------------------------------------------
# paragraph_dedup vs a pure-Python first-occurrence model (dedup19)
# ---------------------------------------------------------------------------

_PARA_WORDS = ["aa", "bb", "cc", " aa ", "AA"]
_para_st = st.lists(st.sampled_from(_PARA_WORDS), min_size=0, max_size=3).map(
    " ".join
)
_paradoc_st = st.lists(_para_st, min_size=0, max_size=4).map("\n".join)
_paracorpus_st = st.lists(_paradoc_st, min_size=1, max_size=6)


def _py_paragraph_dedup(texts):
    seen = {}
    docs = []
    for did, text in enumerate(texts):
        paras = text.split("\n")
        for pos, p in enumerate(paras, start=1):
            key = _norm(p)
            if key == "":
                continue
            if key not in seen:
                seen[key] = (did, pos)
    for did, text in enumerate(texts):
        paras = text.split("\n")
        kept = [
            p
            for pos, p in enumerate(paras, start=1)
            if _norm(p) == "" or seen[_norm(p)] == (did, pos)
        ]
        docs.append(
            (did, "\n".join(kept), len(paras), len(paras) - len(kept))
        )
    return sorted(docs)


@pytest.mark.usefixtures("spark")
@given(_paracorpus_st)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_paragraph_dedup_matches_python_model(spark, texts):
    from nlp_to_nosql_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(tuple(r) for r in paragraph_dedup(df).collect())
    assert got == _py_paragraph_dedup(texts)


# ---------------------------------------------------------------------------
# exact_substring_decontaminate vs a pure-Python coverage model (dc3)
# ---------------------------------------------------------------------------

_tok_st = st.lists(
    st.sampled_from(["p", "q", "r", "s", "t"]), min_size=0, max_size=8
).map(" ".join)


def _py_exact_substr(train, eval_texts, k):
    def toks(t):
        n = _norm(t)
        return n.split(" ")  # '' -> [''] like the engine

    eg = set()
    for t in eval_texts:
        ws = toks(t)
        for i in range(len(ws) - k + 1):
            eg.add(" ".join(ws[i : i + k]))
    out = []
    for did, t in train:
        ws = toks(t)
        covered = set()
        for i in range(len(ws) - k + 1):
            if " ".join(ws[i : i + k]) in eg:
                covered.update(range(i, i + k))
        kept = [w for i, w in enumerate(ws) if i not in covered]
        out.append((did, " ".join(kept), len(ws), len(ws) - len(kept)))
    return sorted(out)


@pytest.mark.usefixtures("spark")
@given(
    st.lists(_tok_st, min_size=1, max_size=6),
    st.lists(_tok_st, min_size=1, max_size=4),
    st.integers(min_value=2, max_value=4),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_substring_decontaminate_matches_python_model(
    spark, train_texts, eval_texts, k
):
    from nlp_to_nosql_spark.operators.curation import (
        exact_substring_decontaminate,
    )

    train = list(enumerate(train_texts))
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    edf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(eval_texts)],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in exact_substring_decontaminate(tdf, edf, k=k).collect()
    )
    assert got == _py_exact_substr(train, eval_texts, k)
