"""Text-analysis functions: Spark results match their DuckDB SQL twins."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nlp_to_nosql_spark.functions import text as X

SAMPLES = [
    "The quick brown fox jumps over the lazy dog.",
    "  spaced   out\ttabs\nand newlines  ",
    "le chat est dans la maison, et le chien est pour la vie",
    "el perro que corre por la casa con una bola",
    "der hund ist bei das haus und nicht mit ein auto",
    "no stop words here xyzzy plugh!!!",
    "punctuation!!! heavy??? text;;; right:::",
    "short",
    "the the the the and and of of to to",
]


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i: int, t: string")


def duck(expr_sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE s(i INT, t VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?, ?)", list(enumerate(SAMPLES)))
    return dict(con.execute(f"SELECT i, {expr_sql.format(c='t')} FROM s").fetchall())


def spark_vals(sample_df, col):
    return {r["i"]: r["v"] for r in sample_df.select("i", col.alias("v")).collect()}


def test_token_count_matches_duckdb(sample_df):
    assert spark_vals(sample_df, X.token_count(F.col("t"))) == duck(X.TOKEN_COUNT_SQL)


def test_bpe_token_count_matches_duckdb(sample_df):
    assert spark_vals(sample_df, X.bpe_token_count(F.col("t"))) == duck(X.BPE_TOKEN_COUNT_SQL)


def test_stopword_count_matches_duckdb(sample_df):
    assert spark_vals(sample_df, X.stopword_count(F.col("t"))) == duck(X.STOPWORD_COUNT_SQL)


def test_punct_count_matches_duckdb(sample_df):
    assert spark_vals(sample_df, X.punct_count(F.col("t"))) == duck(X.PUNCT_COUNT_SQL)


def test_fingerprint_matches_duckdb(sample_df):
    assert spark_vals(sample_df, X.fingerprint(F.col("t"))) == duck(X.FINGERPRINT_SQL)


def test_fingerprint_normalizes_whitespace_and_case(sample_df, spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " HELLO\tWORLD ")],
        "i: int, t: string",
    )
    fps = {r["i"]: r["fp"] for r in df.select("i", X.fingerprint(F.col("t")).alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[3]


def test_quality_score_matches_duckdb(sample_df):
    sv = spark_vals(sample_df, X.quality_score(F.col("t")))
    dv = duck(X.QUALITY_SCORE_SQL)
    for i in sv:
        assert abs(sv[i] - float(dv[i])) < 1e-9, (i, sv[i], dv[i])


def test_quality_score_orders_sensibly(sample_df):
    sv = spark_vals(sample_df, X.quality_score(F.col("t")))
    # stopword-rich real sentence beats punctuation salad
    assert sv[0] > sv[6]


def test_lang_id_matches_duckdb(sample_df):
    sv = spark_vals(sample_df, X.lang_id(F.col("t")))
    assert sv == duck(X.lang_id_sql())


def test_lang_id_basic_calls(sample_df):
    sv = spark_vals(sample_df, X.lang_id(F.col("t")))
    assert sv[0] == "en"   # English sentence
    assert sv[2] == "fr"   # French stopwords
    assert sv[3] == "es"
    assert sv[4] == "de"
    assert sv[5] == "und"  # no stopwords at all
