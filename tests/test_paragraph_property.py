"""Property pin: paragraph_neardup (dedup20) vs a pure-Python model.

The DuckDB twin pins engine parity; this pins the SEMANTICS — exact
census, md5-arithmetic-permutation MinHash, banding, est-Jaccard
verification, lower-(id, pos)-wins suppression, blank preservation,
ordered rebuild — against an O(60-line) reference over randomized
corpora whose tiny alphabet generates exact dups, near-dups, blanks,
and normalization-equal paragraphs organically.

One deliberate model divergence: the Spark banding hashes each band
slice with xxhash64 (bucket equality) where the model compares slices
directly — identical output absent a 64-bit slice-hash collision,
the documented minhash_lsh_pairs trade.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nlp_to_nosql_spark.operators.dedup import paragraph_neardup

K, NUM_PERM, BANDS, THRESHOLD = 3, 32, 8, 0.5
ROWS = NUM_PERM // BANDS
KNUTH, P = 2654435761, 2147483647

_tok = st.sampled_from(["aa", "bb", "cc", "dd"])
_para = st.lists(_tok, min_size=0, max_size=6).map(" ".join)
_doc = st.lists(_para, min_size=1, max_size=5).map("\n".join)
corpus_st = st.lists(
    st.one_of(_doc, st.none()), min_size=1, max_size=8
)


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip().lower())


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _sig(text: str) -> list:
    ws = [w for w in _norm(text).split(" ") if w != ""] or [""]
    # shingles_of_words: n >= K -> K-grams, else one whole-text shingle
    if len(ws) >= K:
        sh = {" ".join(ws[i:i + K]) for i in range(len(ws) - K + 1)}
    else:
        sh = {" ".join(ws)}
    sig = [P] * NUM_PERM  # any value > the modulus works as +inf seed
    for s in sh:
        base = int(_md5(s)[:7], 16)
        for i in range(NUM_PERM):
            h = ((2 * i + 1) * base + i * KNUTH) % P
            if h < sig[i]:
                sig[i] = h
    return sig


def _py_paragraph_neardup(rows):
    paras = []  # (doc_id, pos, raw, key, blank)
    for did, text in rows:
        if text is None:
            continue
        for pos, raw in enumerate(text.split("\n"), start=1):
            n = _norm(raw)
            paras.append((did, pos, raw, _md5(n), n == ""))
    firsts = {}  # key -> (id, pos, raw)
    for did, pos, raw, key, blank in paras:
        if blank:
            continue
        if key not in firsts or (did, pos) < firsts[key][:2]:
            firsts[key] = (did, pos, raw)
    sigs = {k: _sig(raw) for k, (_, _, raw) in firsts.items()}
    dropped = set()
    keys = sorted(firsts)
    for i, ka in enumerate(keys):
        for kb in keys[i + 1:]:
            sa, sb = sigs[ka], sigs[kb]
            banded = any(
                sa[b * ROWS:(b + 1) * ROWS] == sb[b * ROWS:(b + 1) * ROWS]
                for b in range(BANDS)
            )
            if not banded:
                continue
            est = round(
                sum(1 for x, y in zip(sa, sb) if x == y) / NUM_PERM, 6
            )
            if est < THRESHOLD:
                continue
            loser = kb if firsts[ka][:2] < firsts[kb][:2] else ka
            dropped.add(loser)
    out = {}
    for did, text in rows:
        if text is None:
            out[did] = (None, None, None)
            continue
        pieces = text.split("\n")
        kept = [
            raw
            for pos, raw in enumerate(pieces, start=1)
            if _norm(raw) == ""
            or (
                firsts[_md5(_norm(raw))][:2] == (did, pos)
                and _md5(_norm(raw)) not in dropped
            )
        ]
        out[did] = ("\n".join(kept), len(pieces), len(pieces) - len(kept))
    return out


@pytest.mark.usefixtures("spark")
@given(corpus_st)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_paragraph_neardup_matches_python_model(spark, texts):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_paragraphs"], r["n_removed"])
        for r in paragraph_neardup(df).collect()
    }
    assert got == _py_paragraph_neardup(rows)
