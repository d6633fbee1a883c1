"""Corpus term statistics: TF-IDF top terms per document.

The keyword-extraction pass a training-data pipeline runs for topic
tagging / quality filtering.  Reference parity: the reference has no
corpus-level text analytics (SURVEY §2.8 — absent); this is part of the
beyond-reference LLM-pipeline extension set (SURVEY §7.2 phase 8).

100 TB shape: one shuffle on (doc, token) with map-side combine for TF,
one small aggregate for DF (vocabulary-sized, so AQE broadcasts it back
onto the TF table), a broadcast scalar for the corpus size, and a
per-document window for the top-k.  No Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nlp_to_nosql_spark.operators.dedup import tokenized


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k terms per document by tf·ln(N/df): ``(id, rk, token)``.

    Output carries rank, not score: ln() is not IEEE-exactly-rounded, so
    the raw double could differ in the last ulp across engines — the
    ordering (ties broken by token) is stable, the float is not.

    DF counts rows of the TF table (each (doc, token) appears once), so
    no count-distinct shuffle is needed.  N arrives as a broadcast
    one-row cross join — a scalar subquery, not a driver-side collect.
    """
    toks = tokenized(df, id_col, text_col).select(
        F.col(id_col),
        F.explode(F.col("_words")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfc = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.join(dfc, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "_score",
            F.col("tf")
            * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_score"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select(id_col, "rk", "token")
    )
