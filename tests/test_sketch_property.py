"""Property tests: sketch operators vs pure-Python md5 models.

The Spark forms are Column-expression plans over md5-derived integer
hashes; these pin them to ~10-line Python models over randomized token
multisets — covering hash/bit-math edges (registers that collide, rho
at high trailing-zero counts, CMS cell collisions under tiny widths)
that the example-based tests don't enumerate.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nlp_to_nosql_spark.operators.sketch import cms_cells, hll_registers

# small alphabet forces register/cell collisions; sizes include 0 and 1
docs_st = st.lists(
    st.lists(
        st.sampled_from(["a", "bb", "ccc", "tok", "zz9", "Ω"]),
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=6,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _py_hll(tokens: list[str], m: int = 64) -> dict[int, int]:
    regs: dict[int, int] = {}
    p = m.bit_length() - 1
    for t in tokens:
        h = _h60(t)
        reg, v = h % m, h >> p
        rho = 60 - p + 1 if v == 0 else ((v & -v).bit_length())
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _py_cms(tokens: list[str], depth: int, width: int) -> Counter:
    cells: Counter = Counter()
    for t in tokens:
        for j in range(depth):
            cells[(j, _h60(f"{j}:{t}") % width)] += 1
    return cells


@pytest.mark.usefixtures("spark")
@given(docs_st)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_hll_registers_match_python_model(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["reg"]: r["max_rho"] for r in hll_registers(df, "text").collect()
    }
    # normalize_text lowercases before tokenizing — mirror it
    toks = [t.lower() for words in docs for t in words]
    assert got == _py_hll(toks)


@pytest.mark.usefixtures("spark")
@given(docs_st, st.sampled_from([2, 8, 1024]))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cms_cells_match_python_model(spark, docs, width):
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_cells(df, "text", depth=3, width=width).collect()
    }
    toks = [t.lower() for words in docs for t in words]
    assert got == dict(_py_cms(toks, depth=3, width=width))
