"""Hashed-linear quality classifier vs a pure-python md5 model."""

import hashlib
import re

import pytest
from pyspark.sql import types as T

from nlp_to_nosql_spark.operators.classify import hashed_linear_score

N_BUCKETS = 64
SCALE = 100


def _h15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _model_score(text: str):
    norm = re.sub(r"\s+", " ", text.strip().lower())
    toks = [t for t in norm.split(" ") if t != ""]
    if not toks:
        return None
    s = 0
    for t in toks:
        bucket = _h15(t) % N_BUCKETS
        s += _h15(f"qw:{bucket}") % (2 * SCALE + 1) - SCALE
    return len(toks), s, round(s / len(toks), 6), s > 0


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "  Multiple   SPACES\tand\nnewlines  "),
        (2, ""),  # zero tokens → filtered
        (3, "   \t  "),  # whitespace only → filtered
        (4, "one"),
        (5, "repeat repeat repeat repeat"),
        (6, "Ünïcode tökens and punctuation, too!"),
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    return rows, spark.createDataFrame(rows, schema)


def test_matches_pure_python_model(docs):
    rows, df = docs
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_sum"], r["score"], r["keep"])
        for r in hashed_linear_score(df, n_buckets=N_BUCKETS, scale=SCALE).collect()
    }
    want = {i: _model_score(t) for i, t in rows if _model_score(t) is not None}
    assert got == want


def test_zero_token_docs_filtered(docs):
    _, df = docs
    ids = {
        r["doc_id"]
        for r in hashed_linear_score(df, n_buckets=N_BUCKETS, scale=SCALE).collect()
    }
    assert 2 not in ids and 3 not in ids


def test_keep_is_sign_of_exact_sum(docs):
    _, df = docs
    for r in hashed_linear_score(df, n_buckets=N_BUCKETS, scale=SCALE).collect():
        assert r["keep"] == (r["score_sum"] > 0)
        assert abs(r["score_sum"]) <= SCALE * r["n_tokens"]


def test_repeated_token_scales_linearly(docs):
    rows, df = docs
    got = {
        r["doc_id"]: r
        for r in hashed_linear_score(df, n_buckets=N_BUCKETS, scale=SCALE).collect()
    }
    one = got[4]["score_sum"]  # weight of the single token "one"
    # doc 5 is one token repeated 4x of a different word; check doc 4's
    # own linearity via the model instead: score of "one one one" = 3*w
    import pyspark.sql.functions as F

    df3 = df.filter(F.col("doc_id") == 4).withColumn(
        "text", F.lit("one one one")
    )
    tripled = hashed_linear_score(df3, n_buckets=N_BUCKETS, scale=SCALE).collect()[0]
    assert tripled["score_sum"] == 3 * one
    assert tripled["score"] == got[4]["score"]


def test_real_weights_table_scores_and_plan(docs, spark):
    """The trained-coefficient path: a non-trivial (bucket, weight) table
    must reproduce a pure-python scorer exactly AND leave the plan the
    same zero-shuffle projection as the pseudo-weight contract config."""
    rows, df = docs
    # non-trivial: every bucket weighted, sign alternating, magnitude
    # varying, a few buckets deliberately missing (weigh 0)
    wrows = [
        (b, (b % 7 - 3) * (b + 1)) for b in range(N_BUCKETS) if b % 5 != 0
    ]
    wdf = spark.createDataFrame(wrows, "bucket int, weight long")
    wmap = dict(wrows)

    def py_score(text):
        norm = re.sub(r"\s+", " ", text.strip().lower())
        toks = [t for t in norm.split(" ") if t != ""]
        if not toks:
            return None
        s = sum(wmap.get(_h15(t) % N_BUCKETS, 0) for t in toks)
        return len(toks), s, round(s / len(toks), 6), s > 0

    scored = hashed_linear_score(
        df, n_buckets=N_BUCKETS, scale=SCALE, weights=wdf
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_sum"], r["score"], r["keep"])
        for r in scored.collect()
    }
    want = {i: py_score(t) for i, t in rows if py_score(t) is not None}
    assert got == want

    # the weight table must NOT add an exchange: same scan-project shape
    plan = scored._sc._jvm.PythonSQLUtils.explainString(
        scored._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan, plan


def test_real_weights_bucket_out_of_range_raises(docs, spark):
    _, df = docs
    bad = spark.createDataFrame([(N_BUCKETS, 5)], "bucket int, weight long")
    with pytest.raises(ValueError, match="outside"):
        hashed_linear_score(df, n_buckets=N_BUCKETS, weights=bad)


def test_broadcast_join_weights_tier(docs, spark):
    """Past weightsCollectMax buckets the weights table broadcast-joins
    instead of collecting: values equal the baked kernel exactly, the
    join is a BroadcastHashJoin with no exchange on the corpus side
    (exactly one Exchange total — the per-document partial-agg groupBy),
    and the validation errors match the baked path's."""
    rows, df = docs
    big = 1 << 17  # past the 2^16 default threshold
    wrows = [(b, (b % 11 - 5) * 3) for b in range(0, big, 97)]
    wdf = spark.createDataFrame(wrows, "bucket long, weight long")

    joined = hashed_linear_score(df, n_buckets=big, weights=wdf)
    # plan shape, read BEFORE execution (the post-collect AQE final plan
    # prints materialized stages and double-counts the exchange)
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan, plan
    # exactly one shuffle (the per-doc groupBy); the weights move as a
    # BroadcastExchange, which is not a shuffle of the corpus side
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan, plan
    # baked twin: raise the threshold so the same call collects
    spark.conf.set("spark.nlp2nosql.classify.weightsCollectMax", str(big))
    try:
        baked = hashed_linear_score(df, n_buckets=big, weights=wdf)
        key = lambda r: (  # noqa: E731
            r["doc_id"], r["n_tokens"], r["score_sum"], r["score"], r["keep"]
        )
        assert sorted(map(key, joined.collect())) == sorted(
            map(key, baked.collect())
        )
    finally:
        spark.conf.unset("spark.nlp2nosql.classify.weightsCollectMax")

    dup = spark.createDataFrame(
        [(5, 1), (5, 2)], "bucket long, weight long"
    )
    with pytest.raises(ValueError, match="duplicate weight rows"):
        hashed_linear_score(df, n_buckets=big, weights=dup)
    oob = spark.createDataFrame([(big, 1)], "bucket long, weight long")
    with pytest.raises(ValueError, match="outside"):
        hashed_linear_score(df, n_buckets=big, weights=oob)


def test_real_weights_duplicate_bucket_raises(docs, spark):
    """Duplicate bucket rows would be last-write-wins in collect order —
    nondeterministic scores — so the bounded collect refuses them."""
    _, df = docs
    dup = spark.createDataFrame(
        [(3, 5), (3, -5), (7, 1)], "bucket int, weight long"
    )
    with pytest.raises(ValueError, match="duplicate weight rows"):
        hashed_linear_score(df, n_buckets=N_BUCKETS, weights=dup)


def test_arrow_and_column_impls_are_value_identical(docs, spark):
    """The Arrow fast path vs the Column oracle twin, pseudo AND real
    weights — the similarity.py dual-impl discipline."""
    rows, df = docs
    wdf = spark.createDataFrame(
        [(b, (b % 9 - 4) * 7) for b in range(0, N_BUCKETS, 2)],
        "bucket int, weight long",
    )
    for w in (None, wdf):
        a = sorted(
            hashed_linear_score(
                df, n_buckets=N_BUCKETS, scale=SCALE, weights=w, impl="arrow"
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        c = sorted(
            hashed_linear_score(
                df, n_buckets=N_BUCKETS, scale=SCALE, weights=w, impl="column"
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        assert a == c


def test_bad_impl_raises(docs):
    _, df = docs
    with pytest.raises(ValueError, match="impl"):
        hashed_linear_score(df, impl="numpy")
