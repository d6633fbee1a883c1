"""Token-budget packing: distributed prefix sum must equal the global
cumsum regardless of partitioning; batch rule pinned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nlp_to_nosql_spark.operators.packing import batch_manifest, pack_by_token_budget


@pytest.fixture(scope="module")
def docs(spark):
    # token counts 10,20,...,100 over ids 1..10 → total 550
    return spark.createDataFrame(
        [(i, i * 10) for i in range(1, 11)], "doc_id long, n_tokens long"
    )


def _rows(df):
    return sorted(
        (r["doc_id"], r["cum_tokens"], r["batch_id"]) for r in df.collect()
    )


def test_global_cumsum_matches_single_partition_truth(spark, docs):
    want = [
        (i, sum(j * 10 for j in range(1, i + 1)), (sum(j * 10 for j in range(1, i)) // 100))
        for i in range(1, 11)
    ]
    got = _rows(pack_by_token_budget(docs, "doc_id", "n_tokens", budget=100))
    assert got == want


@pytest.mark.parametrize("parts", [1, 3, 7, 16])
def test_partition_count_independence(spark, docs, parts):
    base = _rows(pack_by_token_budget(docs, "doc_id", "n_tokens", budget=100))
    got = _rows(
        pack_by_token_budget(docs, "doc_id", "n_tokens", budget=100, partitions=parts)
    )
    assert got == base


def test_straddling_doc_goes_to_earlier_batch(spark):
    # doc 2 starts at cum_exclusive=90 (< 100) but ends at 190: batch 0
    docs = spark.createDataFrame(
        [(1, 90), (2, 100), (3, 10)], "doc_id long, n_tokens long"
    )
    got = {r["doc_id"]: r["batch_id"] for r in
           pack_by_token_budget(docs, "doc_id", "n_tokens", budget=100).collect()}
    assert got == {1: 0, 2: 0, 3: 1}


def test_manifest(spark, docs):
    packed = pack_by_token_budget(docs, "doc_id", "n_tokens", budget=100)
    m = {r["batch_id"]: (r["n_docs"], r["n_tokens"], r["first_id"], r["last_id"])
         for r in batch_manifest(packed, "doc_id", "n_tokens").collect()}
    total_docs = sum(v[0] for v in m.values())
    total_tokens = sum(v[1] for v in m.values())
    assert total_docs == 10 and total_tokens == 550
    # batches are contiguous id ranges
    spans = sorted((v[2], v[3]) for v in m.values())
    for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
        assert b1 < a2


def test_budget_validation(spark, docs):
    with pytest.raises(ValueError, match="budget"):
        pack_by_token_budget(docs, "doc_id", "n_tokens", budget=0)


def test_best_fit_pack_matches_duckdb_twin(spark):
    """pack3: exact-integer buckets, realized-max slot counts,
    (bucket, n DESC, id) ranking, and offset arithmetic replay
    value-exactly in the relational twin — zero-length, boundary
    (n = budget), and oversize (n > budget) rows included."""
    import random

    import duckdb
    import pandas as pd

    from nlp_to_nosql_spark.operators.packing import (
        best_fit_pack,
        best_fit_pack_sql,
    )

    rng = random.Random(5)
    rows = [
        (i, rng.choice([0, 1, 3, 7, 12, 25, 49, 50, 99, 100, 150, 2500]))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = sorted(
        tuple(r)
        for r in best_fit_pack(df, "doc_id", "n_tokens", budget=100).collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "n_tokens"]))
    want = sorted(
        tuple(r)
        for r in con.execute(best_fit_pack_sql(100, "n_tokens")).fetchall()
    )
    assert got == want and len(got) == 200


def test_best_fit_pack_invariants(spark):
    """Structural contract: no in-budget bin overflows the budget, bin
    slot indices are dense from 0, oversize docs sit alone in their own
    bins, and every doc appears exactly once."""
    import collections
    import random

    from nlp_to_nosql_spark.operators.packing import best_fit_pack

    rng = random.Random(11)
    rows = [(i, rng.randint(0, 130)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = best_fit_pack(df, "doc_id", "n_tokens", budget=100).collect()
    assert len(out) == 300 and len({r["doc_id"] for r in out}) == 300
    fills = collections.Counter()
    slots_by_bin = collections.defaultdict(set)
    for r in out:
        assert 0 <= r["slot"] < r["bin_slots"]
        slots_by_bin[r["bin_id"]].add(r["slot"])
        if r["bucket"] >= 0:
            fills[r["bin_id"]] += r["n_tokens"]
        else:
            assert r["n_tokens"] > 100 and r["bin_slots"] == 1
    assert all(f <= 100 for f in fills.values())
    # bins are disjoint across buckets (global ids) and slots dense
    for bid, ss in slots_by_bin.items():
        assert ss == set(range(len(ss)))


def test_best_fit_pack_beats_baseline_pad(spark):
    """pad_stats: the packed pad fraction is far below the
    one-doc-per-sequence baseline, and the token accounting is exact."""
    import random

    from nlp_to_nosql_spark.operators.packing import best_fit_pack, pad_stats

    rng = random.Random(3)
    # long-tailed lengths (most docs short, a few near-budget) — the
    # realistic corpus shape; uniform-on-(budget/2, budget] is the
    # bucketing worst case (single-slot bins) and only halves the pad
    rows = [
        (i, rng.randint(5, 30) if rng.random() < 0.8 else rng.randint(31, 95))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = best_fit_pack(df, "doc_id", "n_tokens", budget=100)
    s = pad_stats(packed, 100).collect()[0]
    assert s["n_docs"] == 400
    assert s["n_tokens"] == sum(n for _, n in rows)
    assert s["capacity"] == s["n_bins"] * 100
    # this fixture's exact figures: pad 29.3% vs baseline 75.1% (2.5×);
    # the bound asserts the structural win (fill factor ≈ bucket
    # avg/max beats one-doc-per-sequence by ≥2× on long-tailed lengths)
    assert s["pad_frac_micro"] < s["baseline_pad_frac_micro"] // 2


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


def _py_best_fit(rows, budget):
    """Pure-Python twin of best_fit_pack: exact-integer buckets,
    realized-max slots, (bucket, n DESC, id) ranks, offset arithmetic."""
    buck = {}
    for i, n in rows:
        k = -1 if n > budget else (budget // max(n, 1)).bit_length() - 1
        buck.setdefault(k, []).append((i, n))
    out = {}
    bin_off = 0
    for k in sorted(buck):
        docs = sorted(buck[k], key=lambda t: (-t[1], t[0]))
        slots = 1 if k == -1 else max(
            1, budget // max(max(n for _, n in docs), 1)
        )
        for r, (i, n) in enumerate(docs):
            out[i] = (n, k, slots, bin_off + r // slots, r % slots)
        bin_off += -(-len(docs) // slots)
    return out


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@pytest.mark.usefixtures("spark")
@given(
    lens=st.lists(
        st.integers(min_value=0, max_value=260), min_size=1, max_size=60
    ),
    budget=st.sampled_from([1, 7, 64, 100]),
)
@settings(max_examples=20, deadline=None)
def test_best_fit_pack_matches_python_model(spark, lens, budget):
    """pack3 vs the 15-line pure-Python model over randomized lengths —
    zero-length docs, n == budget boundaries, oversize rows, budget 1
    (every doc oversize or single-slot), and rank ties by id."""
    from nlp_to_nosql_spark.operators.packing import best_fit_pack

    rows = list(enumerate(lens))
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["bucket"], r["bin_slots"], r["bin_id"],
            r["slot"],
        )
        for r in best_fit_pack(df, "doc_id", "n_tokens", budget=budget)
        .collect()
    }
    assert got == _py_best_fit(rows, budget)
