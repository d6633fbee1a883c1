"""Data selection and tokenizer fitting for LLM training corpora.

Two pipeline stages that sit between quality filtering and packing:

* **DSIR importance selection** (Xie et al., arXiv:2302.03169, "Data
  Selection for Language Models via Importance Resampling"): estimate
  hashed-n-gram bag-of-words distributions for a small TARGET corpus
  and the large raw POOL, score every pool document by its importance
  log-ratio sum, and keep the top-k most target-like documents.  This
  is the distribution-matching tier of data selection — above the
  per-document heuristics (``functions.text.quality_score``,
  ``curation.gopher_quality``) and the discriminative classifier
  (``classify.hashed_linear_score``), which all score documents in
  isolation.
* **BPE merge-pair counting** (Sennrich et al., arXiv:1508.07909): the
  distributed inner step of byte-pair-encoding tokenizer training —
  adjacent-symbol pair frequencies weighted by word counts, computed on
  the DISTINCT-word table, never on the raw token stream.

No reference analogue (the reference's 1.2 kLoC Mongo/Streamlit surface
has no corpus operators); both are driver-brief pipeline extensions.

Determinism discipline (the repo-wide oracle contract): every float
step is floored to integer micros BEFORE any aggregation, so the only
cross-engine float trust is ``ln`` of exactly-representable integers
(the one libm-trusted op, used under a 1e-6 floor grid); all sums are
then BIGINT and partition-order-free.  Feature hashing is the md5
60-bit family shared with ``classify`` so DuckDB replays it verbatim.

Scale notes (100 TB):

* DSIR makes exactly TWO passes over the exploded feature stream — one
  bucket-count groupBy (output ≤ ``n_buckets`` rows) and one per-doc
  score groupBy (one narrow row per pool document); the ``n_buckets``
  log-ratio table rides a broadcast hash join, never a corpus-side
  exchange.  Top-k is ``TakeOrdered`` (per-partition heads), not a
  global sort.
* BPE pair counting pays one corpus-token shuffle for word counts, then
  all pair work happens on the vocabulary table (Heaps' law: orders of
  magnitude smaller than the corpus) weighted by counts — the same
  trick every production BPE trainer uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nlp_to_nosql_spark.functions import text as tx
from nlp_to_nosql_spark.operators.classify import _h15
from nlp_to_nosql_spark.plans.partitioning import fan_out

#: DuckDB rendering of the 60-bit md5 hash family (``_h15``).
_H15_SQL = "CAST(CAST('0x' || substr(md5({x}), 1, 15) AS UBIGINT) AS BIGINT)"

#: Micro grid shared by both engines: log-ratios are floored onto this
#: grid before the (exact, BIGINT) per-document sum.
_MICRO = 1_000_000


def _tokens(text_col: str) -> Column:
    """The house whitespace tokenization (shared with ``classify``)."""
    return F.filter(
        F.split(tx.normalize_text(F.col(text_col)), " "),
        lambda t: t != F.lit(""),
    )


def _unigram_bigram(ts: Column) -> Column:
    """Unigrams + space-joined word bigrams of a token array.

    ``zip_with`` over two shifted slices rather than ``transform`` over
    ``sequence(1, n-1)`` because Spark's ``sequence`` infers step -1
    when start > stop — ``sequence(1, 0)`` is ``[1, 0]``, not empty —
    so the single-token case needs an explicit guard either way and the
    slice form keeps the lambda free of index arithmetic.
    """
    bigrams = F.when(
        F.size(ts) > 1,
        F.zip_with(
            F.slice(ts, 1, F.size(ts) - 1),
            F.slice(ts, 2, F.size(ts) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return F.concat(ts, bigrams)


def _feature_buckets(
    df: DataFrame,
    target: Column,
    n_buckets: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """``(id, is_target, bucket)`` — one row per hashed n-gram feature.

    The feature array is staged as a projected attribute BEFORE the
    explode (the repo-wide ExtractGenerator discipline: non-generator
    expressions in the same select are hoisted above the Generate and
    re-evaluated per OUTPUT row otherwise).
    """
    narrow = fan_out(
        df.select(F.col(id_col), target.alias("_is_t"), F.col(text_col))
    )
    staged = narrow.select(
        F.col(id_col),
        F.col("_is_t"),
        _tokens(text_col).alias("_ts"),
    )
    feats = staged.select(
        id_col, "_is_t", _unigram_bigram(F.col("_ts")).alias("_fs")
    )
    return feats.select(
        F.col(id_col),
        F.col("_is_t"),
        F.explode("_fs").alias("_f"),
    ).select(
        F.col(id_col),
        F.col("_is_t"),
        F.pmod(_h15(F.col("_f")), F.lit(n_buckets)).alias("bucket"),
    )


def _bucket_ratios_from(feats: DataFrame, n_buckets: int) -> DataFrame:
    """Log-ratio table derived from a :func:`_feature_buckets` stream.

    The bucket-count groupBy partial-aggregates map-side to at most
    ``n_buckets`` rows per task BEFORE its exchange, so the shuffle
    moves O(n_buckets × partitions) narrow rows regardless of corpus
    size.  (A shared per-document ``(id, bucket, cnt)`` pre-aggregation
    was A/B'd against this two-pass shape and LOST — 10× probe factor
    1.2× → 1.7× — because its ReusedExchange moves O(distinct doc-bucket
    pairs) rows where this plan's two exchanges are both corpus-size-
    independent; tokenizing twice is scan-side compute that AQE's scan
    parallelism absorbs.  The repo rule holds: narrow derivation >
    ReusedExchange > persist.)
    """
    bc = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0))
        .cast("long")
        .alias("tc"),
        F.sum(F.when(F.col("_is_t"), 0).otherwise(1))
        .cast("long")
        .alias("pc"),
    )
    tot = bc.agg(
        F.sum("tc").cast("long").alias("_tt"),
        F.sum("pc").cast("long").alias("_tp"),
    )
    b = F.lit(n_buckets).cast("long")
    return bc.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "tc",
        "pc",
        F.floor(
            (
                F.log(F.col("tc") + 1)
                - F.log(F.col("_tt") + b)
                - F.log(F.col("pc") + 1)
                + F.log(F.col("_tp") + b)
            )
            * F.lit(float(_MICRO))
        )
        .cast("long")
        .alias("lr_micro"),
    )


def dsir_bucket_ratios(
    df: DataFrame,
    target: Column,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-bucket importance log-ratios of target vs pool distributions.

    Returns ``(bucket, tc, pc, lr_micro)``: the BIGINT target and pool
    feature counts and ``floor(1e6 * (ln p̂_target(b) − ln p̂_pool(b)))``
    under add-one smoothing, i.e. the micro-floored value of::

        ln(tc+1) − ln(Tt+B) − ln(pc+1) + ln(Tp+B)

    evaluated left-to-right (both engines share the association; every
    ``ln`` argument is an exactly-representable BIGINT).  At most
    ``n_buckets`` rows — the fitted "model", cheap to broadcast.
    """
    return _bucket_ratios_from(
        _feature_buckets(df, target, n_buckets, text_col, id_col),
        n_buckets,
    )


def dsir_select(
    df: DataFrame,
    target: Column,
    n_buckets: int = 4096,
    k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k pool documents by DSIR importance weight.

    Fits the bucket log-ratio table on ``df`` (target rows = ``target``
    true, pool = the rest), scores every POOL document with the exact
    BIGINT sum of its features' ``lr_micro``, and returns
    ``(id, n_feats, weight_micro)`` — the ``k`` most target-like pool
    documents under the deterministic order ``(weight_micro DESC, id
    ASC)``, or all pool documents unordered when ``k`` is None.

    This is the deterministic argmax-k variant of the paper's Gumbel
    top-k resampling (the noise draw is a sampling temperature, not a
    correctness property — and a seeded noise column would be the one
    thing DuckDB could not replay).  Plan shape: the feature stream
    feeds two groupBys — the bucket-count fit (map-side combined to
    ≤ n_buckets rows per task) and the per-document sum (one narrow row
    per pool doc) — so BOTH exchanges are corpus-size-independent; the
    log-ratio table joins back by BROADCAST and top-k is TakeOrdered.
    The corpus is tokenized twice (once per pass), deliberately: see
    :func:`_bucket_ratios_from` for the measured A/B against a shared
    per-document pre-aggregation.
    """
    feats = _feature_buckets(df, target, n_buckets, text_col, id_col)
    lr = _bucket_ratios_from(feats, n_buckets)
    scored = (
        feats.filter(~F.col("_is_t"))
        .join(F.broadcast(lr.select("bucket", "lr_micro")), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lr_micro").cast("long").alias("weight_micro"),
        )
    )
    if k is None:
        return scored
    return scored.orderBy(
        F.desc("weight_micro"), F.asc(id_col)
    ).limit(k)


def dsir_select_by(
    df: DataFrame,
    target: Column,
    group_col: str,
    n_buckets: int = 4096,
    k_per_group: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-balanced DSIR: top-k pool documents PER GROUP.

    The production variant of :func:`dsir_select` — a global top-k lets
    one over-represented domain claim the whole selection budget, so
    curation pipelines quota per source/domain instead (the mixture
    discipline of ``curation.temperature_mixture``, applied at the
    selection stage).  Returns ``(id, group, n_feats, weight_micro,
    rnk)`` for the ``k_per_group`` highest-weight pool documents of
    each group under the deterministic per-group order
    ``(weight_micro DESC, id ASC)``.

    Plan shape: scoring is the unordered :func:`dsir_select` plan (its
    exchanges stay corpus-size-independent); the ``(id, group)``
    projection then joins onto the already-reduced one-row-per-doc
    scored frame, and the rank filter over that reduced frame is
    rewritten by Spark to WindowGroupLimit — per-partition top-k BEFORE
    the window exchange — so few groups do not funnel the corpus
    through single reducers (pinned by ``tests/test_selection.py``).
    """
    scored = dsir_select(
        df, target, n_buckets, k=None, text_col=text_col, id_col=id_col
    )
    joined = scored.join(df.select(id_col, group_col), id_col)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("weight_micro"), F.asc(id_col)
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k_per_group)
        .select(id_col, group_col, "n_feats", "weight_micro", "rnk")
    )


def _dsir_scored_ctes(
    target_sql: str,
    n_buckets: int,
    table: str,
    text_col: str,
    id_col: str,
) -> str:
    """The shared CTE chain of the DSIR twins, ending in ``scored``."""
    norm = tx.NORMALIZE_SQL.format(c=text_col)
    bkt = _H15_SQL.format(x="f") + f" % {n_buckets}"
    return (
        f"WITH toks AS (SELECT {id_col}, ({target_sql}) AS is_t, "
        f"list_filter(string_split({norm}, ' '), t -> t <> '') AS ts "
        f"FROM {table}), "
        "feats AS (SELECT "
        f"{id_col}, is_t, {bkt} AS bucket "
        "FROM toks, LATERAL UNNEST(list_concat(ts, "
        "list_transform(generate_series(1, len(ts) - 1), "
        "i -> ts[i] || ' ' || ts[i + 1]))) AS u(f)), "
        "b AS (SELECT bucket, "
        "CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS tc, "
        "CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS pc "
        "FROM feats GROUP BY bucket), "
        "tot AS (SELECT CAST(SUM(tc) AS BIGINT) AS tt, "
        "CAST(SUM(pc) AS BIGINT) AS tp FROM b), "
        "lr AS (SELECT bucket, CAST(floor((ln(tc + 1) - "
        f"ln(tt + {n_buckets}) - ln(pc + 1) + ln(tp + {n_buckets})) "
        f"* {_MICRO}) AS BIGINT) AS lr_micro FROM b, tot), "
        f"scored AS (SELECT f.{id_col}, "
        "CAST(count(*) AS BIGINT) AS n_feats, "
        "CAST(SUM(lr.lr_micro) AS BIGINT) AS weight_micro "
        "FROM feats f JOIN lr USING (bucket) WHERE NOT f.is_t "
        f"GROUP BY f.{id_col})"
    )


def dsir_select_by_sql(
    target_sql: str = "lang = 'en'",
    group_col: str = "source",
    n_buckets: int = 4096,
    k_per_group: int = 10,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`dsir_select_by` — the shared scored CTEs
    plus a group join and a ``row_number`` rank filter with the same
    per-group (weight DESC, id ASC) total order."""
    ctes = _dsir_scored_ctes(target_sql, n_buckets, table, text_col, id_col)
    return (
        f"{ctes} "
        f"SELECT {id_col}, {group_col}, n_feats, weight_micro, "
        "CAST(rnk AS INT) AS rnk FROM ("
        f"SELECT s.{id_col}, d.{group_col}, s.n_feats, s.weight_micro, "
        f"row_number() OVER (PARTITION BY d.{group_col} "
        f"ORDER BY s.weight_micro DESC, s.{id_col}) AS rnk "
        f"FROM scored s JOIN {table} d USING ({id_col})) "
        f"WHERE rnk <= {k_per_group}"
    )


def dsir_select_sql(
    target_sql: str = "lang = 'en'",
    n_buckets: int = 4096,
    k: int = 100,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`dsir_select` — same tokenization, bigram
    construction (1-based ``ts[i] || ' ' || ts[i+1]`` ≡ the Spark
    ``zip_with`` of shifted slices), md5 buckets, smoothing, ``ln``
    association, micro floor, and (weight DESC, id ASC) top-k."""
    ctes = _dsir_scored_ctes(target_sql, n_buckets, table, text_col, id_col)
    return (
        f"{ctes} "
        f"SELECT {id_col}, n_feats, weight_micro FROM scored "
        f"ORDER BY weight_micro DESC, {id_col} LIMIT {k}"
    )


def bpe_merge_pairs(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """Top merge candidates of one BPE training iteration.

    Counts adjacent character pairs WITHIN words, weighted by corpus
    word frequency, and returns the ``top_n`` ``(pair, pair_count)``
    rows under the deterministic order ``(pair_count DESC, pair ASC)``
    — exactly the statistic a BPE trainer maximizes per merge (no
    end-of-word marker; symbols are single characters, i.e. the first
    iteration).

    The pair generation runs on the DISTINCT-word table: one
    corpus-token shuffle for word counts, then O(vocab × word_len) pair
    work — the corpus never re-tokenizes per iteration.  ``substring``
    is 1-based in both engines, so ``substring(w, i, 2)`` for
    ``i ∈ [1, len−1]`` is the shared pair enumeration; the generator
    input guards the single-character case explicitly (Spark's
    ``sequence(1, 0)`` is ``[1, 0]``, not empty).
    """
    words = (
        df.select(F.explode(_tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("_wc"))
    )
    pairs = words.select(
        F.col("_wc"),
        F.explode(
            F.when(
                F.length("w") > 1,
                F.expr(
                    "transform(sequence(1, length(w) - 1), "
                    "i -> substring(w, i, 2))"
                ),
            ).otherwise(F.expr("CAST(array() AS array<string>)"))
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(
        F.sum("_wc").cast("long").alias("pair_count")
    )
    return counts.orderBy(
        F.desc("pair_count"), F.asc("pair")
    ).limit(top_n)


def bpe_merge_pairs_sql(
    top_n: int = 50,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bpe_merge_pairs` — same tokenization, the
    same 1-based ``substr(w, i, 2)`` enumeration (``generate_series(1,
    0)`` IS empty in DuckDB, so no guard needed), BIGINT counts, and
    (count DESC, pair ASC) top-n."""
    norm = tx.NORMALIZE_SQL.format(c=text_col)
    return (
        "WITH toks AS (SELECT "
        f"list_filter(string_split({norm}, ' '), t -> t <> '') AS ts "
        f"FROM {table}), "
        "words AS (SELECT f AS w, CAST(count(*) AS BIGINT) AS wc "
        "FROM toks, LATERAL UNNEST(ts) AS u(f) GROUP BY f), "
        "pairs AS (SELECT p AS pair, CAST(SUM(wc) AS BIGINT) AS "
        "pair_count FROM words, LATERAL UNNEST(list_transform("
        "generate_series(1, len(w) - 1), i -> substr(w, i, 2))) AS v(p) "
        "GROUP BY p) "
        "SELECT pair, pair_count FROM pairs "
        f"ORDER BY pair_count DESC, pair LIMIT {top_n}"
    )
