"""Pin the xxhash64/float-sign PRODUCTION fast paths to their
oracle-backed twins BY TEST.

The xxhash64 minhash/simhash families and the float-sign SRP buckets
have no DuckDB twin — since round 6 the ``dedup3``/``dedup4``/``ann2``
*contract entries* run oracle-reproducible families (md5 signatures,
integer-exact SRP), and these production families remain first-class
operators whose correctness argument is equivalence to the
oracle-backed variants: the md5 signature families (``dedup9``/
``dedup10``, value-level oracles) and brute-force cosine (``ann1``).
Round 3 carried that claim in prose only; these tests make it
executable, on the real sf0.01 ``documents``/``embeddings`` tables.

The bounds are hash-family variance bounds, calibrated on this (fixed,
deterministic) dataset:

* minhash est-Jaccard σ = sqrt(J(1-J)/64) ≤ 0.0625 per family — observed
  max cross-family difference is exactly 1σ; asserted ≤ 2σ;
* simhash bits are independent Bernoulli draws per family, so only the
  CONFIDENT region transfers: hamming ≤ 2 (of 64) in one family stays
  within the twin's ≤ 10 acceptance — borderline pairs (normalized
  hamming ≈ threshold) legitimately differ between families;
* the sign-LSH scoring tier is shared with brute force, so at full probe
  (max_hamming = nbits) the fast path IS ``ann1``, exactly.
"""

from __future__ import annotations

import pytest

import nlp_to_nosql_spark.operators.dedup as dd
from nlp_to_nosql_spark.operators.similarity import (
    RandomHyperplaneLSH,
    topk_bruteforce,
)
from nlp_to_nosql_spark.sources.catalog import register_tables

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return register_tables(spark, SF_DIR)["documents"]


@pytest.fixture(scope="module")
def emb(spark):
    return register_tables(spark, SF_DIR)["embeddings"]


def _pairs(df, value_col):
    return {(r["id_a"], r["id_b"]): r[value_col] for r in df.collect()}


def test_minhash_xxhash_family_matches_md5_twin(docs):
    """dedup3 vs dedup10 — same pipeline, only the hash family differs.
    At the entry's parameters the PAIR SETS must be identical and the
    est-Jaccard values must agree within 2σ = 0.125."""
    params = dict(k=3, num_perm=64, bands=16, threshold=0.3)
    fast = _pairs(
        dd.minhash_lsh_pairs(docs, "doc_id", "text", **params), "est_jaccard"
    )
    twin = _pairs(
        dd.minhash_lsh_pairs(
            docs, "doc_id", "text", sig_fn=dd.minhash_signatures_md5, **params
        ),
        "est_jaccard",
    )
    assert set(fast) == set(twin)
    assert fast  # non-vacuous: the planted near-dups are present
    assert max(abs(fast[p] - twin[p]) for p in fast) <= 0.125


def test_simhash_xxhash_family_contains_md5_twin_confident_region(docs):
    """dedup4 vs dedup9's family — 64-bit xxhash vs 60-bit md5 simhash.
    Bits are independent draws per family, so only the confident region
    transfers: every pair at hamming ≤ 2 in one family must be accepted
    (hamming ≤ 10) by the other, in both directions."""
    fast = _pairs(
        dd.simhash_pairs(docs, "doc_id", "text", max_hamming=10, bands=4),
        "hamming",
    )
    twin = _pairs(
        dd.simhash_pairs(
            docs,
            "doc_id",
            "text",
            max_hamming=10,
            bands=4,
            sig=dd.simhash60_md5("text"),
            sig_bits=60,
        ),
        "hamming",
    )
    fast_confident = {p for p, h in fast.items() if h <= 2}
    twin_confident = {p for p, h in twin.items() if h <= 2}
    assert fast_confident and twin_confident  # non-vacuous
    assert fast_confident <= set(twin)
    assert twin_confident <= set(fast)


def test_sign_lsh_full_probe_equals_bruteforce(emb):
    """ann2's search tier IS ann1 at full probe: with max_hamming = nbits
    every signature qualifies, so the candidate set is the corpus and the
    shared scoring tier must reproduce brute force exactly (ids, order,
    and cosine values)."""
    q_row = emb.filter("vec_id = 0").select("embedding").first()
    q = [float(x) for x in q_row["embedding"]]
    lsh = RandomHyperplaneLSH(dim=len(q), nbits=16, seed=42)
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in lsh.topk(emb, q, k=10, max_hamming=16).collect()
    ]
    want = [
        (r["vec_id"], r["cos_sim"]) for r in topk_bruteforce(emb, q, k=10).collect()
    ]
    assert got == want


def test_sign_lsh_partial_probe_recall_and_exact_scores(emb):
    """At the entry's parameters (nbits=16, max_hamming=6) the fast path
    must keep majority recall against ann1, find the query itself, and —
    because candidates are scored by the same exact kernel — every
    returned cosine must equal its brute-force value."""
    q_row = emb.filter("vec_id = 0").select("embedding").first()
    q = [float(x) for x in q_row["embedding"]]
    lsh = RandomHyperplaneLSH(dim=len(q), nbits=16, seed=42)
    got = {
        r["vec_id"]: r["cos_sim"]
        for r in lsh.topk(emb, q, k=10, max_hamming=6).collect()
    }
    exact_all = {
        r["vec_id"]: r["cos_sim"]
        for r in topk_bruteforce(emb, q, k=emb.count()).collect()
    }
    want10 = {
        r["vec_id"] for r in topk_bruteforce(emb, q, k=10).collect()
    }
    assert 0 in got  # the query vector itself is its own nearest neighbor
    assert len(set(got) & want10) >= 5  # observed 6/10 on this dataset
    for vid, cos in got.items():
        assert cos == exact_all[vid]  # scoring tier is exact, only recall is approx
