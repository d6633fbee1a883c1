"""DSIR importance selection + BPE merge-pair counting vs pure-python
models and the DuckDB oracle twins, on edge-heavy synthetic docs."""

import hashlib
import math
import re
from collections import Counter

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nlp_to_nosql_spark.operators.selection import (
    bpe_merge_pairs,
    bpe_merge_pairs_sql,
    dsir_select,
    dsir_select_by,
    dsir_select_by_sql,
    dsir_select_sql,
)

N_BUCKETS = 64
MICRO = 1_000_000

ROWS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "  Multiple   SPACES\tand\nnewlines here  ", "en"),
    (2, "", "de"),  # zero tokens → zero features → never scored
    (3, "   \t  ", "de"),  # whitespace only → same
    (4, "one", "de"),  # single token → no bigrams, no char pairs
    (5, "repeat repeat repeat repeat", "de"),
    (6, "Ünïcode tökens and punctuation, too!", "fr"),
    (7, "a b c d e", "fr"),  # single-char words → no BPE pairs
    (8, "the quick brown fox again and again", "es"),
    (9, "zzz yyy xxx the of and", "es"),
]


def _h15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str):
    norm = re.sub(r"\s+", " ", text.strip().lower())
    return [t for t in norm.split(" ") if t != ""]


def _feats(text: str):
    ts = _toks(text)
    return ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]


def _py_dsir(rows, k):
    tc, pc = Counter(), Counter()
    for _, text, lang in rows:
        cnt = tc if lang == "en" else pc
        for f in _feats(text):
            cnt[_h15(f) % N_BUCKETS] += 1
    tt, tp = sum(tc.values()), sum(pc.values())
    lr = {
        b: math.floor(
            (
                math.log(tc[b] + 1)
                - math.log(tt + N_BUCKETS)
                - math.log(pc[b] + 1)
                + math.log(tp + N_BUCKETS)
            )
            * MICRO
        )
        for b in set(tc) | set(pc)
    }
    scored = []
    for i, text, lang in rows:
        if lang == "en":
            continue
        fs = _feats(text)
        if fs:
            scored.append(
                (i, len(fs), sum(lr[_h15(f) % N_BUCKETS] for f in fs))
            )
    scored.sort(key=lambda r: (-r[2], r[0]))
    return scored[:k]


def _py_bpe(rows, top_n):
    words = Counter(t for _, text, _ in rows for t in _toks(text))
    pairs = Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += c
    return sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]


@pytest.fixture(scope="module")
def docs(spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    return spark.createDataFrame(ROWS, schema)


def test_dsir_matches_pure_python_model(docs):
    got = [
        (r["doc_id"], r["n_feats"], r["weight_micro"])
        for r in dsir_select(
            docs, F.col("lang") == "en", n_buckets=N_BUCKETS, k=5
        ).collect()
    ]
    assert got == _py_dsir(ROWS, 5)


def test_dsir_matches_duckdb_twin(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(ROWS, columns=["doc_id", "text", "lang"])
    )
    want = con.execute(
        dsir_select_sql(n_buckets=N_BUCKETS, k=5)
    ).fetchall()
    got = [
        tuple(r)
        for r in dsir_select(
            docs, F.col("lang") == "en", n_buckets=N_BUCKETS, k=5
        ).collect()
    ]
    assert got == [tuple(r) for r in want]


def test_dsir_all_target_pool_empty(docs):
    assert (
        dsir_select(docs, F.lit(True), n_buckets=N_BUCKETS, k=5).count()
        == 0
    )


def test_dsir_k_exceeds_pool(docs):
    # 8 non-en rows, 2 of them zero-feature → 6 scored pool docs
    got = dsir_select(
        docs, F.col("lang") == "en", n_buckets=N_BUCKETS, k=100
    ).collect()
    assert len(got) == 6


def test_dsir_plan_broadcasts_ratios(docs):
    q = dsir_select(docs, F.col("lang") == "en", n_buckets=N_BUCKETS, k=5)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "simple"
    )
    # the ≤ n_buckets log-ratio table joins by broadcast; nothing falls
    # back to a corpus-side shuffle join, a cartesian pairing, or Python
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_dsir_per_group_matches_duckdb_twin(docs):
    # lang doubles as the group column: per-group quotas + rank order
    # must match the twin exactly, including the rnk column type
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(ROWS, columns=["doc_id", "text", "lang"])
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            dsir_select_by_sql(
                group_col="lang", n_buckets=N_BUCKETS, k_per_group=2
            )
        ).fetchall()
    )
    got = sorted(
        tuple(r)
        for r in dsir_select_by(
            docs,
            F.col("lang") == "en",
            "lang",
            n_buckets=N_BUCKETS,
            k_per_group=2,
        ).collect()
    )
    assert got == want
    # quota respected per group, and only pool groups appear
    langs = [r[1] for r in got]
    assert all(langs.count(g) <= 2 for g in set(langs))
    assert "en" not in langs


def test_dsir_per_group_plan_uses_window_group_limit(docs):
    q = dsir_select_by(
        docs, F.col("lang") == "en", "lang",
        n_buckets=N_BUCKETS, k_per_group=2,
    )
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "simple"
    )
    # the rank filter must push per-partition (no full-group sort funnel)
    assert "WindowGroupLimit" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_bpe_matches_pure_python_model(docs):
    got = [
        (r["pair"], r["pair_count"])
        for r in bpe_merge_pairs(docs, top_n=10).collect()
    ]
    assert got == _py_bpe(ROWS, 10)


def test_bpe_matches_duckdb_twin(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(ROWS, columns=["doc_id", "text", "lang"])
    )
    want = con.execute(bpe_merge_pairs_sql(top_n=10)).fetchall()
    got = [tuple(r) for r in bpe_merge_pairs(docs, top_n=10).collect()]
    assert got == [tuple(r) for r in want]


def test_bpe_single_char_words_yield_no_pairs(spark):
    df = spark.createDataFrame(
        [(0, "a b c d", "en")], "doc_id long, text string, lang string"
    )
    assert bpe_merge_pairs(df).count() == 0


def test_bpe_plan_two_shuffles_takeordered(docs):
    q = bpe_merge_pairs(docs, top_n=10)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "simple"
    )
    # one corpus-token shuffle (word counts) + one vocab-sized shuffle
    # (pair counts); top-n is TakeOrdered, never a global sort
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan, plan
