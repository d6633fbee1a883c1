"""Model-based quality filtering: hashed linear (fastText-style) scoring.

The third quality tier of an LLM-data pipeline, after heuristic rules
(``functions.text.quality_score``) and Gopher-style structural rules
(``curation.gopher_quality``): a LINEAR CLASSIFIER over hashed
bag-of-words features, the shape used by the CCNet / RefinedWeb /
fastText quality filters (Wenzek et al., arXiv:1911.00359; Penedo et
al., arXiv:2306.01116; Joulin et al., arXiv:1607.01759).

Model = the hashing trick: token → md5-bucket in ``[0, n_buckets)``,
bucket → an int64 weight, document score = Σ weight(bucket(token)),
decision = score > 0.  Everything is ONE zero-shuffle JVM projection —
tokenize (the house ``normalize_text`` whitespace tokenization, shared
with ``expl1``), ``transform`` each token to its bucket weight, and
``aggregate`` the int64 sum.  No explode, no groupBy: per-document cost
is O(tokens), the plan is a scan + project that pipelines into whatever
filter consumes ``keep``.

The CONTRACT configuration derives weights deterministically from the
bucket id (md5-keyed pseudo-weights, integer in [-scale, +scale]) so the
score replays bit-exactly in DuckDB (:func:`hashed_linear_score_sql`).
A REAL trained model drops in without changing the plan: its coefficient
table is ≤ ``n_buckets`` rows — a broadcast map-side join or a literal
``CASE`` expression — and the rest of the projection is untouched.

Determinism discipline: the per-document sum is exact int64 (weights are
integers, |weight| ≤ scale, docs ≪ 2⁵³ tokens), so partition order can't
change it; only the final mean divides, and both engines divide the same
two exact integers into the same IEEE double before the shared round-6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nlp_to_nosql_spark.functions import text as tx


def _h15(c: Column) -> Column:
    """60-bit non-negative md5 integer — the repo-wide md5-family hash
    (``CAST('0x' || substr(md5(x), 1, 15) AS UBIGINT)`` in DuckDB)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    scale: int = 1000,
) -> DataFrame:
    """Score every document with the hashed linear model.

    Returns ``(id, n_tokens, score_sum, score, keep)``: the exact int64
    feature-weight sum, the round-6 per-token mean, and the sign
    decision.  Documents with zero tokens are filtered (no decision
    without evidence — and no divide-by-zero in either engine).
    """
    modulus = 2 * scale + 1
    toks = F.filter(
        F.split(tx.normalize_text(F.col(text_col)), " "),
        lambda t: t != F.lit(""),
    )

    def weight(t: Column) -> Column:
        bucket = F.pmod(_h15(t), F.lit(n_buckets))
        return (
            F.pmod(
                _h15(F.concat(F.lit("qw:"), bucket.cast("string"))),
                F.lit(modulus),
            )
            - F.lit(scale)
        )

    scored = df.select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(
            F.transform(toks, weight),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("score_sum"),
    )
    return scored.filter(F.col("n_tokens") > 0).select(
        id_col,
        "n_tokens",
        "score_sum",
        F.round(F.col("score_sum") / F.col("n_tokens"), 6).alias("score"),
        (F.col("score_sum") > 0).alias("keep"),
    )


def hashed_linear_score_sql(
    n_buckets: int = 1024,
    scale: int = 1000,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`hashed_linear_score` — same tokenization,
    md5 buckets, pseudo-weights, exact integer sum, and round-6 mean.
    (Hashes are non-negative, so ``%`` here equals Spark's ``pmod``.)"""
    norm = tx.NORMALIZE_SQL.format(c=text_col)
    h15 = "CAST(CAST('0x' || substr(md5({x}), 1, 15) AS UBIGINT) AS BIGINT)"
    bucket = h15.format(x="t") + f" % {n_buckets}"
    wgt = (
        h15.format(x=f"'qw:' || CAST({bucket} AS VARCHAR)")
        + f" % {2 * scale + 1} - {scale}"
    )
    return (
        f"WITH toks AS (SELECT {id_col}, "
        f"list_filter(string_split({norm}, ' '), t -> t <> '') AS ts "
        f"FROM {table}), "
        f"w AS (SELECT {id_col}, CAST(len(ts) AS BIGINT) AS n_tokens, "
        f"CAST(coalesce(list_sum(list_transform(ts, t -> {wgt})), 0) "
        "AS BIGINT) AS score_sum FROM toks) "
        f"SELECT {id_col}, n_tokens, score_sum, "
        "ROUND(score_sum / n_tokens, 6) AS score, "
        "score_sum > 0 AS keep "
        "FROM w WHERE n_tokens > 0"
    )
