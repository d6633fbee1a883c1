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
