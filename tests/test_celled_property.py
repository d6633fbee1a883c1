"""Property pin: knn_graph_celled (ann14) vs a pure-Python model.

The DuckDB twin pins engine parity; this pins the SEMANTICS of the
whole composition — integer micro-k-means fit (seeded sample,
hash-spread init, exact squared-L2 argmin with lowest-index ties,
floor-division means, empty-cell carryover), full-corpus assignment,
int8 quantization, per-cell all-pairs quantized cosine with
``(sim DESC, dst ASC)`` top-k, and the within-cell mutual flag —
against a reference over randomized vectors (including negatives and
the all-zero vector, which scores 0 against everything).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nlp_to_nosql_spark.operators.similarity import knn_graph_celled

MICRO = 1_000_000
SEED, ITERS = 7, 2

_comp = st.one_of(
    st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 1000.0),
    st.just(0.0),
)
vecs_st = st.lists(
    st.tuples(st.just(0), st.tuples(_comp, _comp, _comp, _comp)),
    min_size=3,
    max_size=14,
).map(lambda rows: [(i, list(v)) for i, (_, v) in enumerate(rows)])


def _h28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _micro(v):
    return [math.floor(float(x) * MICRO) for x in v]


def _py_cells(vecs, n_cells):
    # training sample: sample_mod=1, sample_keep=1 -> everything
    train = [(i, _micro(v)) for i, v in vecs]
    init = sorted(train, key=lambda r: (_h28(f"kminit{SEED}:{r[0]}"), r[0]))
    cents = [mv[:] for _, mv in init[:n_cells]]
    dim = len(cents[0])

    def assign(mv):
        best = None
        for c, cm in enumerate(cents):
            d = sum((a - b) * (a - b) for a, b in zip(mv, cm))
            if best is None or (d, c) < best:
                best = (d, c)
        return best[1]

    for _ in range(ITERS):
        sums = {}
        for i, mv in train:
            c = assign(mv)
            s, n = sums.setdefault(c, ([0] * dim, 0))
            for j, x in enumerate(mv):
                s[j] += x
            sums[c] = (s, n + 1)
        nxt = [cm[:] for cm in cents]
        for c, (s, n) in sums.items():
            nxt[c] = [x // n for x in s]
        if nxt == cents:
            break
        cents = nxt
    return {i: assign(_micro(v)) for i, v in vecs}


def _py_celled_graph(vecs, n_cells, k, levels=127):
    cells = _py_cells(vecs, n_cells)
    codes = {}
    for i, v in vecs:
        maxabs = max((abs(float(x)) for x in v), default=0.0)
        codes[i] = (
            [int(math.floor(float(x) / maxabs * levels)) for x in v]
            if maxabs > 0
            else [0] * len(v)
        )
    edges = {}
    for src in codes:
        cands = []
        for dst in codes:
            if dst == src or cells[dst] != cells[src]:
                continue
            a, b = codes[src], codes[dst]
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            sim = round(dot / (na * nb), 6) if na * nb > 0 else 0.0
            cands.append((dst, sim))
        cands.sort(key=lambda t: (-t[1], t[0]))
        edges[src] = cands[:k]
    out = {}
    for src, cs in edges.items():
        for rank, (dst, sim) in enumerate(cs, 1):
            mutual = any(d == src for d, _ in edges.get(dst, []))
            out[(src, dst)] = (cells[src], rank, sim, mutual)
    return out


@pytest.mark.usefixtures("spark")
@given(vecs_st, st.integers(min_value=1, max_value=3),
       st.integers(min_value=1, max_value=3))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_knn_graph_celled_matches_python_model(spark, vecs, n_cells, k):
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    got = {
        (r["src"], r["dst"]): (r["cell"], r["rank"], r["quant_sim"],
                               r["mutual"])
        for r in knn_graph_celled(
            df, n_cells=n_cells, k=k, block_size=4,
            sample_mod=1, sample_keep=1, seed=SEED, iters=ITERS,
        ).collect()
    }
    assert got == _py_celled_graph(vecs, n_cells, k)
