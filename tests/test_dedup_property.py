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
