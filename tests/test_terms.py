"""TF-IDF top-terms operator (operators/terms.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nlp_to_nosql_spark.operators.terms import tfidf_top_terms

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def test_tfidf_top_terms_ranks(spark):
    # N=3; df: apple 2, banana 2, cherry 1, durian 1.
    df = spark.createDataFrame(
        [
            (0, "apple apple banana"),
            (1, "banana cherry cherry cherry"),
            (2, "apple durian"),
        ],
        SCHEMA,
    )
    out = tfidf_top_terms(df, "doc_id", "text", k=3).collect()
    top = {(r["doc_id"], r["rk"]): r["token"] for r in out}
    # d0: apple 2·ln(3/2) > banana 1·ln(3/2)
    assert top[(0, 1)] == "apple" and top[(0, 2)] == "banana"
    # d1: cherry 3·ln(3) > banana
    assert top[(1, 1)] == "cherry" and top[(1, 2)] == "banana"
    # d2: durian ln(3) > apple ln(3/2)
    assert top[(2, 1)] == "durian" and top[(2, 2)] == "apple"
    assert len(out) == 2 + 2 + 2  # no doc has a 3rd distinct token... (d1 has 2)


def test_tfidf_tie_breaks_on_token(spark):
    # Both tokens have tf=1, df=1 → equal scores; tie → lexicographic.
    df = spark.createDataFrame(
        [(0, "zebra aardvark"), (1, "filler filler filler")],
        SCHEMA,
    )
    out = {(r["doc_id"], r["rk"]): r["token"]
           for r in tfidf_top_terms(df, "doc_id", "text", k=2).collect()}
    assert out[(0, 1)] == "aardvark" and out[(0, 2)] == "zebra"


def test_tfidf_k_limits_rows(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g h"), (1, "a b")], SCHEMA
    )
    out = tfidf_top_terms(df, "doc_id", "text", k=3)
    counts = {r["doc_id"]: r["n"] for r in
              out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert counts[0] == 3 and counts[1] == 2


def test_bigram_collocations_counts(spark):
    from nlp_to_nosql_spark.operators.terms import bigram_collocations

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, None), (4, "x")],
        "doc_id long, text string",
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in bigram_collocations(df, min_count=1).collect()
    }
    # bigrams: (a,b)x2 + (b,a) from doc1; (a,b),(b,c) from doc2 -> N=5
    ab = out[("a", "b")]
    assert ab["n_pair"] == 3 and ab["n_bigrams"] == 5
    assert ab["n_first"] == 3  # bigrams starting with a
    assert ab["n_second"] == 3  # bigrams ending with b
    # lift(a,b) = (3/5) / ((3/5)*(3/5)) = 5/3 -> 1666666 micro
    assert ab["lift_micro"] == 1666666
    assert ("x", "x") not in out  # single-token doc has no bigram


def test_bigram_collocations_matches_duckdb(spark):
    import os

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        import pytest

        pytest.skip("testdata not present")
    import duckdb

    from nlp_to_nosql_spark.operators.terms import (
        bigram_collocations,
        collocations_sql,
    )
    from nlp_to_nosql_spark.sources.catalog import register_tables

    docs = register_tables(spark, sf_dir)["documents"]
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["lift_micro"])
        for r in bigram_collocations(docs, min_count=5).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        (w1, w2): (np, lm)
        for w1, w2, np, _, _, _, lm in con.execute(
            collocations_sql(min_count=5)
        ).fetchall()
    }
    assert got == want and len(got) > 10


def test_vocab_coverage_curve(spark):
    from nlp_to_nosql_spark.operators.terms import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["rank"]: r for r in vocab_coverage(df, top_n=2).collect()}
    # counts: a=4, b=3, c=1, N=8; top-2 = a, b
    assert rows[1]["token"] == "a" and rows[1]["cnt"] == 4
    assert rows[2]["token"] == "b" and rows[2]["cum_cnt"] == 7
    assert rows[1]["coverage_micro"] == 500000  # 4/8
    assert rows[2]["coverage_micro"] == 875000  # 7/8
    assert len(rows) == 2


def test_vocab_coverage_matches_duckdb(spark):
    import os

    import duckdb

    from nlp_to_nosql_spark.operators.terms import (
        vocab_coverage,
        vocab_coverage_sql,
    )
    from nlp_to_nosql_spark.sources.catalog import register_tables

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        import pytest

        pytest.skip("testdata not present")
    docs = register_tables(spark, sf_dir)["documents"]
    got = [tuple(r) for r in vocab_coverage(docs, top_n=25).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(vocab_coverage_sql(top_n=25)).fetchall()
    assert got == [tuple(r) for r in want]


def test_source_divergence_matches_duckdb(spark):
    import os

    import duckdb

    from nlp_to_nosql_spark.operators.terms import (
        source_divergence,
        source_divergence_sql,
    )
    from nlp_to_nosql_spark.sources.catalog import register_tables

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        import pytest

        pytest.skip("testdata not present")
    docs = register_tables(spark, sf_dir)["documents"]
    got = {
        (r["src_a"], r["src_b"]): (r["chi2_micro"], r["n_terms"])
        for r in source_divergence(docs, top_v=50).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        (a, b): (c, n)
        for a, b, c, n in con.execute(
            source_divergence_sql(top_v=50)
        ).fetchall()
    }
    assert got == want and len(got) >= 3


def test_source_divergence_detects_drift(spark):
    """A source with a disjoint vocabulary must diverge far more from
    the others than they do from each other."""
    from nlp_to_nosql_spark.operators.terms import source_divergence

    rows = (
        [(i, "a b c d e", "s1") for i in range(20)]
        + [(100 + i, "a b c d e", "s2") for i in range(20)]
        + [(200 + i, "x y z w q", "s3") for i in range(20)]  # drifted
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["src_a"], r["src_b"]): r["chi2_micro"]
        for r in source_divergence(df, top_v=20).collect()
    }
    assert got[("s1", "s2")] == 0  # identical distributions
    assert got[("s1", "s3")] > 0 and got[("s2", "s3")] > 0


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

def _bm25_collect(spark, docs_rows, query_rows, **kw):
    from nlp_to_nosql_spark.operators.terms import bm25_topk

    docs = spark.createDataFrame(docs_rows, SCHEMA)
    q = spark.createDataFrame(query_rows, "query_id string, token string")
    return bm25_topk(docs, q, "doc_id", "text", **kw).collect()


def test_bm25_ranks_by_match_strength(spark):
    # d0 matches both terms, d1 one term (twice), d2 neither.
    rows = _bm25_collect(
        spark,
        [
            (0, "apple banana cherry"),
            (1, "apple apple durian"),
            (2, "cherry durian fig"),
        ],
        [("q1", "apple"), ("q1", "banana")],
        k=5,
    )
    got = [(r["rk"], r["doc_id"]) for r in sorted(rows, key=lambda r: r["rk"])]
    # banana (df=1) has higher idf than apple (df=2); d0 holds both terms.
    assert [d for _, d in got] == [0, 1]
    assert all(r["score_micro"] > 0 for r in rows)


def test_bm25_duplicate_query_terms_not_double_counted(spark):
    docs = [(0, "apple banana"), (1, "apple cherry")]
    once = _bm25_collect(spark, docs, [("q1", "apple")])
    twice = _bm25_collect(spark, docs, [("q1", "apple"), ("q1", "apple")])
    key = lambda rows: sorted((r["rk"], r["doc_id"], r["score_micro"]) for r in rows)
    assert key(once) == key(twice)


def test_bm25_absent_term_and_empty_query_set(spark):
    docs = [(0, "apple banana"), (1, "cherry durian")]
    # A term absent from the corpus contributes nothing (df would be 0).
    rows = _bm25_collect(spark, docs, [("q1", "apple"), ("q1", "zzz")])
    assert [r["doc_id"] for r in rows] == [0]
    assert _bm25_collect(spark, docs, [("qx", "zzz")]) == []
    from nlp_to_nosql_spark.operators.terms import bm25_topk

    empty_q = spark.createDataFrame([], "query_id string, token string")
    out = bm25_topk(
        spark.createDataFrame(docs, SCHEMA), empty_q, "doc_id", "text"
    )
    assert out.count() == 0


def test_bm25_salted_topk_matches_single_bucket(spark):
    docs = [(i, f"apple w{i % 4} w{i % 7}") for i in range(40)]
    q = [("q1", "apple"), ("q1", "w1"), ("q2", "w2")]
    a = _bm25_collect(spark, docs, q, k=3, topk_buckets=1)
    b = _bm25_collect(spark, docs, q, k=3, topk_buckets=8)
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(a) == key(b) and len(a) == 6


def test_bm25_matches_duckdb(spark):
    import os

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        import pytest

        pytest.skip("testdata not present")
    import duckdb

    from nlp_to_nosql_spark.operators.terms import bm25_topk, bm25_topk_sql
    from nlp_to_nosql_spark.sources.catalog import register_tables

    qrows = [("q1", "fast"), ("q1", "merge"), ("q2", "the"), ("q2", "stream")]
    docs = register_tables(spark, sf_dir)["documents"]
    q = spark.createDataFrame(qrows, "query_id string, token string")
    got = sorted(
        tuple(r) for r in bm25_topk(docs, q, "doc_id", "text", k=5).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(con.execute(bm25_topk_sql(qrows, k=5)).fetchall())
    assert got == want and len(got) == 10


# ---------------------------------------------------------------------------
# Zipf-slope diagnostic (prof6)
# ---------------------------------------------------------------------------


def test_zipf_slope_matches_pure_python_fit(spark):
    import math
    from collections import Counter

    from nlp_to_nosql_spark.operators.terms import zipf_slope

    texts = [
        "a a a a a a b b b b c c c d d e",
        "a a b b c d e f g",
        "a b c",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    counts = Counter()
    for t in texts:
        counts.update(t.split())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.floor(math.log(r) * 1000.0) for r in range(1, len(ranked) + 1)]
    ys = [math.floor(math.log(c) * 1000.0) for _, c in ranked]
    n = float(len(xs))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxx = float(sum(x * x for x in xs))
    syy = float(sum(y * y for y in ys))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = zipf_slope(df).collect()[0]
    assert row["n_vocab"] == len(ranked)
    assert row["n_tokens"] == sum(counts.values())
    assert row["slope"] == slope
    assert row["slope"] < 0  # frequency falls with rank


def test_zipf_slope_degenerate_vocab_yields_null_fit(spark):
    from nlp_to_nosql_spark.operators.terms import zipf_slope

    df = spark.createDataFrame([(0, "same same same")], "doc_id long, text string")
    row = zipf_slope(df).collect()[0]
    assert row["n_vocab"] == 1 and row["slope"] is None
