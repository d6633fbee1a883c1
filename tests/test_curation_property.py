"""Property tests: curation operators vs pure-Python references.

The Spark implementations are array-expression / groupBy plans; these
pin them to O(10-line) Python models over randomized inputs, covering
the boundary arithmetic no example-based test enumerates (chunk edges,
single/empty docs, skewed word distributions).
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nlp_to_nosql_spark.operators.curation import (
    bigram_likelihood,
    chunk_by_tokens,
    repetition_signals,
)

words_st = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "eee"]), min_size=0, max_size=40
)
chunk_params = st.tuples(
    st.integers(min_value=2, max_value=12),  # chunk_tokens
    st.integers(min_value=0, max_value=11),  # overlap (filtered below)
).filter(lambda t: t[1] < t[0])


def _py_chunks(words: list[str], chunk: int, overlap: int) -> list[list[str]]:
    """Reference: minimal strided cover, 0-based."""
    stride = chunk - overlap
    n = len(words)
    k_max = max(0, -(-(max(n - chunk, 0)) // stride))
    return [words[k * stride : k * stride + chunk] for k in range(k_max + 1)]


@pytest.mark.usefixtures("spark")
@given(st.lists(words_st, min_size=1, max_size=5), chunk_params)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunking_matches_python_reference(spark, docs, params):
    chunk, overlap = params
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got: dict[int, list[str]] = {}
    for r in (
        chunk_by_tokens(df, chunk_tokens=chunk, overlap=overlap)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    ):
        got.setdefault(r["doc_id"], []).append(r["chunk"])
    for i, ws in enumerate(docs):
        # exact equality with the reference already implies full word
        # coverage and the minimal-cover (no pure-suffix chunk) property
        want = [" ".join(c) for c in _py_chunks(ws, chunk, overlap)]
        assert got[i] == want, (ws, chunk, overlap)


@pytest.mark.usefixtures("spark")
@given(st.lists(words_st, min_size=1, max_size=5))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_repetition_matches_python_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    for i, ws in enumerate(docs):
        # normalize_text of "" splits to [""] — one empty token, like Spark
        toks = ws if ws else [""]
        r = got[i]
        assert r["n_words"] == len(toks)
        assert r["distinct_word_frac"] == pytest.approx(
            round(len(set(toks)) / len(toks), 6), abs=1e-9
        )
        wc = Counter(toks)
        assert r["top_word_frac"] == pytest.approx(
            round(max(wc.values()) / len(toks), 6), abs=1e-9
        )
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        want_g = round(max(Counter(grams).values()) / len(grams), 6) if grams else 0.0
        assert r["top_2gram_frac"] == pytest.approx(want_g, abs=1e-9)


@pytest.mark.usefixtures("spark")
@given(st.lists(words_st, min_size=1, max_size=4))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bigram_likelihood_matches_python_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_likelihood(df).collect()}

    all_grams: list[tuple[str, str]] = []
    for ws in docs:
        toks = ws if ws else [""]
        all_grams += list(zip(toks, toks[1:]))
    bc = Counter(all_grams)
    pc = Counter(a for a, _ in all_grams)

    for i, ws in enumerate(docs):
        toks = ws if ws else [""]
        grams = list(zip(toks, toks[1:]))
        r = got[i]
        assert r["n_bigrams"] == len(grams)
        if not grams:
            assert r["mean_cond_prob_micro"] is None
        else:
            micros = [bc[g] * 1_000_000 // pc[g[0]] for g in grams]
            assert r["mean_cond_prob_micro"] == sum(micros) // len(micros)


def _py_mix_hash(doc_id: int, seed: int) -> int:
    """Pure-Python twin of curation._mix_hash (md5_hash28 % 1e6)."""
    import hashlib

    h = hashlib.md5(f"mix{seed}:{doc_id}".encode()).hexdigest()[:7]
    return int(h, 16) % 1_000_000


@pytest.mark.usefixtures("spark")
@given(
    st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]), st.integers(0, 10_000)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    st.floats(min_value=0.05, max_value=1.0),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_temperature_sample_matches_python_reference(spark, rows, frac):
    """Thresholds AND membership agree with a 10-line float model — the
    operator's floor-scaled integer pipeline is exactly the math below."""
    import math

    from nlp_to_nosql_spark.operators.curation import temperature_sample

    df = spark.createDataFrame(
        [(i, s) for s, i in rows], "doc_id long, source string"
    )
    out = temperature_sample(df, target_frac=frac, seed=11).collect()

    counts = Counter(s for s, _ in rows)
    n_total = sum(counts.values())
    sqrt_micro = {s: math.floor(math.sqrt(n) * 1000000) for s, n in counts.items()}
    sum_sqrt = sum(sqrt_micro.values())
    want_threshold = {
        s: math.floor(
            min(1.0, ((frac * n_total) * sqrt_micro[s]) / (sum_sqrt * counts[s]))
            * 1000000
        )
        for s in counts
    }
    want_ids = {
        i for s, i in rows if _py_mix_hash(i, 11) < want_threshold[s]
    }
    assert {r["doc_id"] for r in out} == want_ids
    for r in out:
        assert r["threshold_micro"] == want_threshold[r["source"]]


@pytest.mark.usefixtures("spark")
@given(st.lists(words_st, min_size=1, max_size=4))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gopher_stats_match_python_reference(spark, docs):
    """The per-row stats feeding the keep decision (mean word length,
    symbol fraction, stopword count) against direct Python arithmetic.
    The word-derived signals are covered by the repetition property
    test; `keep` is their AND, covered example-based."""
    from nlp_to_nosql_spark.operators.curation import gopher_rules

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    for i, ws in enumerate(docs):
        text = " ".join(ws)
        norm_words = text.strip().lower().split(" ")
        n_words = max(len(norm_words), 1)
        mean_len = round(sum(len(w) for w in norm_words) / n_words, 6)
        assert got[i]["mean_word_len"] == pytest.approx(mean_len, abs=1e-9)
        # corpus alphabet is alnum + space → symbol_frac always 0
        assert got[i]["symbol_frac"] == 0.0
        n_stop = sum(1 for w in norm_words if w == "a")  # only stopword in alphabet
        assert got[i]["n_stopwords"] == n_stop


def _py_boilerplate(docs_words: dict[int, list[str]], k: int, max_df: int):
    """Reference model: stride-1 k-gram census over distinct per-doc
    chunks, >max_df-doc chunks boilerplate, window-union coverage,
    1-based index rebuild."""
    chunks: dict[int, list[tuple[int, str]]] = {}
    for d, ws in docs_words.items():
        if len(ws) >= k:
            spans = [(i + 1, " ".join(ws[i : i + k])) for i in range(len(ws) - k + 1)]
        else:
            spans = [(1, " ".join(ws))]
        chunks[d] = spans
    df_count: Counter = Counter()
    for d, spans in chunks.items():
        for ch in {c for _, c in spans}:
            df_count[ch] += 1
    boiler = {c for c, cnt in df_count.items() if cnt > max_df}
    out = {}
    for d, ws in docs_words.items():
        cov: set[int] = set()
        for pos, ch in chunks[d]:
            if ch in boiler:
                cov.update(range(pos, pos + k))
        clean = [w for idx, w in enumerate(ws, start=1) if idx not in cov]
        out[d] = (" ".join(clean), len(ws), len(ws) - len(clean))
    return out


@pytest.mark.usefixtures("spark")
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12),
        min_size=2,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=3),  # max_df
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_boilerplate_removal_matches_python_reference(spark, docs, max_df):
    """3-letter alphabet makes cross-doc 3-gram collisions common, so the
    census/coverage/rebuild arithmetic is exercised hard; k=3 keeps the
    short-doc whole-chunk branch reachable too."""
    from nlp_to_nosql_spark.operators.curation import remove_boilerplate_spans

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
        for r in remove_boilerplate_spans(df, k=3, max_df=max_df).collect()
    }
    want = _py_boilerplate(dict(enumerate(docs)), 3, max_df)
    assert got == want, (docs, max_df)


# ---------------------------------------------------------------------------
# quality6: C4 heuristic line/document rules vs pure-Python model
# ---------------------------------------------------------------------------

_c4_line = st.one_of(
    st.text(alphabet="ab .!?\"'{}\t", min_size=0, max_size=40),
    st.sampled_from(
        [
            "enable javascript to view this page now.",
            "read our privacy policy before continuing here.",
            "lorem ipsum dolor sit amet consectetur adipiscing.",
            "a b a b a b.",
            "  padded words sit here fine.  ",
            'quote terminated line with many words "here"',
        ]
    ),
)
_c4_docs = st.lists(
    st.lists(_c4_line, min_size=0, max_size=5).map("\n".join),
    min_size=1,
    max_size=6,
)


def _py_c4(text):
    import re

    from nlp_to_nosql_spark.operators.curation import (
        C4_DOC_DROP_PHRASES,
        C4_LINE_DROP_PHRASES,
        C4_THRESHOLDS,
    )

    raw = text or ""
    lines = raw.split("\n")

    def keep_line(x):
        t = x.strip(" \t\r")
        words = [
            w
            for w in re.sub("[ \t\x0b\f\r]+", " ", t).split(" ")
            if w != ""
        ]
        if len(words) < C4_THRESHOLDS["min_words_per_line"]:
            return False
        if not (t and t[-1] in ".!?\"'"):
            return False
        low = t.lower()
        return not any(p in low for p in C4_LINE_DROP_PHRASES)

    kept = [x for x in lines if keep_line(x)]
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    brace = "{" in raw or "}" in raw
    phrase = any(p in raw.lower() for p in C4_DOC_DROP_PHRASES)
    keep = (
        len(kept) >= 1
        and n_sent >= C4_THRESHOLDS["min_sentences"]
        and not brace
        and not phrase
    )
    return (len(lines), len(kept), n_sent, brace, phrase, clean, keep)


@pytest.mark.usefixtures("spark")
@given(_c4_docs)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_c4_rules_matches_python_model(spark, docs):
    """quality6 vs the pure-Python twin over randomized multi-line
    documents — empty lines/docs, whitespace-only lines, tab word
    splits, quote terminators, drop phrases mid-line, and brace /
    lorem-ipsum doc kills."""
    from nlp_to_nosql_spark.operators.curation import c4_rules

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_lines"], r["n_kept_lines"], r["n_sentences"],
            r["has_brace"], r["has_doc_phrase"], r["clean_text"],
            r["keep"],
        )
        for r in c4_rules(df).collect()
    }
    want = {i: _py_c4(t) for i, t in enumerate(docs)}
    assert got == want, docs
