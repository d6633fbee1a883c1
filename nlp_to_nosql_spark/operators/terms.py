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


def bigram_collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Corpus-level collocation mining: adjacent-bigram lift over the
    normalized token stream — the phrase/named-entity discovery pass a
    tokenizer-training pipeline runs before merging multi-word units.

    Probabilities are defined over BIGRAM events only (P(x·) = bigrams
    starting with x, P(·y) = bigrams ending with y, N = all bigrams), so
    every number derives from ONE pair table and the marginals are exact
    re-aggregations of it — no second pass over the corpus.  ``lift =
    P(xy) / (P(x·)·P(·y))``; emitted as ``lift_micro = floor(lift·1e6)``
    where every float op is the same IEEE double op in the same
    association as the SQL twin (multiply, multiply, divide, multiply,
    floor — each correctly rounded, so the BIGINT is engine-exact; same
    discipline as ``similarity.quantize_embeddings``).

    Plan: token explode (no shuffle) → one partial-aggregated groupBy on
    (w1, w2) — the only corpus-sized shuffle — then vocabulary-sized
    marginal aggregates joined back (AQE broadcasts them) and a one-row
    broadcast cross join for N.  Output: ``(w1, w2, n_pair, n_first,
    n_second, n_bigrams, lift_micro)``, pairs with ``n_pair >=
    min_count``.
    """
    from nlp_to_nosql_spark.operators.curation import _tokens

    toks = _tokens(df, id_col, text_col)
    words = F.col("_w")
    n = F.size(words)
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(words, 1, n - 1),
                F.slice(words, 2, n - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    pc = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pair")
    )
    fx = pc.groupBy("w1").agg(F.sum("n_pair").cast("long").alias("n_first"))
    fy = pc.groupBy("w2").agg(F.sum("n_pair").cast("long").alias("n_second"))
    nn = pc.agg(F.sum("n_pair").cast("long").alias("n_bigrams"))
    num = F.col("n_pair").cast("double") * F.col("n_bigrams").cast("double")
    den = F.col("n_first").cast("double") * F.col("n_second").cast("double")
    return (
        pc.filter(F.col("n_pair") >= min_count)
        .join(fx, "w1")
        .join(fy, "w2")
        .crossJoin(F.broadcast(nn))
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_first",
            "n_second",
            "n_bigrams",
            F.floor((num / den) * F.lit(1000000.0))
            .cast("long")
            .alias("lift_micro"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """Vocabulary coverage curve: the ``top_n`` most frequent tokens
    with rank, count, running count, and ``coverage_micro`` =
    ``floor((cum/total)·1e6)`` — the "how many merges until X% of the
    stream is covered" number a tokenizer-training budget starts from.

    Empty tokens are excluded on both engines (the normalized split of
    an empty document is ``['']``).  Ranks tie-break on the token
    string.  ``coverage_micro`` divides BEFORE scaling (one IEEE double
    divide, multiply, floor — identical association in the SQL twin),
    so it cannot overflow at any corpus size.

    Plan: one corpus-sized partial-aggregated groupBy (the token
    census), then ``TakeOrderedAndProject`` for the top-N — the running
    sum's unpartitioned window sees only those N rows, so the
    single-partition window is bounded by construction, not by data.
    The total arrives as a one-row broadcast cross join.
    """
    from nlp_to_nosql_spark.operators.curation import _tokens

    toks = (
        _tokens(df, id_col, text_col)
        .select(F.explode(F.col("_w")).alias("token"))
        .filter(F.col("token") != "")
    )
    tf = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    nn = tf.agg(F.sum("cnt").cast("long").alias("n_total"))
    top = tf.orderBy(F.desc("cnt"), F.asc("token")).limit(int(top_n))
    order = Window.orderBy(F.desc("cnt"), F.asc("token"))
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.select(
            F.row_number().over(order).cast("int").alias("rank"),
            "token",
            "cnt",
            F.sum("cnt").over(run).cast("long").alias("cum_cnt"),
        )
        .crossJoin(F.broadcast(nn))
        .select(
            "rank",
            "token",
            "cnt",
            "cum_cnt",
            F.floor(
                (F.col("cum_cnt").cast("double") / F.col("n_total").cast("double"))
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("coverage_micro"),
        )
    )


def vocab_coverage_sql(
    table: str = "documents",
    text_col: str = "text",
    top_n: int = 50,
) -> str:
    """DuckDB twin of :func:`vocab_coverage` — identical census,
    ordering, running frame, and IEEE association."""
    from nlp_to_nosql_spark.functions.text import NORMALIZE_SQL

    norm = NORMALIZE_SQL.format(c=f"COALESCE({text_col}, '')")
    return (
        f"WITH words AS (SELECT string_split({norm}, ' ') AS w "
        f"FROM {table}), "
        "tok AS (SELECT unnest(w) AS token FROM words), "
        "tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM tok WHERE token <> '' GROUP BY 1), "
        "nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM tf), "
        f"top AS (SELECT token, cnt FROM tf "
        f"ORDER BY cnt DESC, token LIMIT {int(top_n)}), "
        "ranked AS (SELECT "
        "CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank, "
        "token, cnt, "
        "CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt FROM top) "
        "SELECT rank, token, cnt, cum_cnt, "
        "CAST(FLOOR((CAST(cum_cnt AS DOUBLE) / CAST(n_total AS DOUBLE)) "
        "* 1000000.0) AS BIGINT) AS coverage_micro FROM ranked, nn"
    )


def source_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_v: int = 200,
) -> DataFrame:
    """Corpus drift between sources: pairwise chi-square divergence of
    unigram distributions over the shared top-``top_v`` vocabulary —
    the monitoring signal that catches one crawler/feed drifting before
    it poisons the mixture (new boilerplate, language shift, spam).

    Engine-exactness: expected counts and per-term contributions are a
    FIXED chain of IEEE double ops (each count < 2^53 converts
    exactly), but their SUM over the vocabulary would depend on
    partition order as doubles — so each term is floored to integer
    micros FIRST and the cross-partition aggregation is an exact BIGINT
    sum (the ``bigram_likelihood`` discipline).  Output per unordered
    source pair: ``chi2_micro`` (floor-summed χ² · 1e6) and ``n_terms``.

    Scale: one corpus-sized token census (partial-aggregated groupBy);
    everything after operates on |sources|·top_v rows — the vocabulary
    cap bounds the pair grid by construction, and the census is the
    only pass over the corpus.
    """
    from nlp_to_nosql_spark.functions.text import normalize_text
    from nlp_to_nosql_spark.plans.partitioning import fan_out

    toks = (
        fan_out(df.select(group_col, text_col))
        .select(
            F.col(group_col),
            F.explode(
                F.split(
                    normalize_text(F.coalesce(F.col(text_col), F.lit(""))),
                    " ",
                )
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    tf = toks.groupBy(group_col, "token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    vocab = (
        tf.groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("_tot"))
        .orderBy(F.desc("_tot"), F.asc("token"))
        .limit(int(top_v))
        .select("token")
    )
    tfv = tf.join(F.broadcast(vocab), "token")
    totals = tfv.groupBy(group_col).agg(
        F.sum("cnt").cast("long").alias("n_total")
    )
    grid = (
        totals.select(
            F.col(group_col).alias("src_a"), F.col("n_total").alias("n_a")
        )
        .crossJoin(
            F.broadcast(
                totals.select(
                    F.col(group_col).alias("src_b"),
                    F.col("n_total").alias("n_b"),
                )
            )
        )
        .filter(F.col("src_a") < F.col("src_b"))
        .crossJoin(F.broadcast(vocab))
    )
    ca = tfv.select(
        F.col(group_col).alias("src_a"),
        F.col("token"),
        F.col("cnt").alias("o_a"),
    )
    cb = tfv.select(
        F.col(group_col).alias("src_b"),
        F.col("token"),
        F.col("cnt").alias("o_b"),
    )
    j = (
        grid.join(ca, ["src_a", "token"], "left")
        .join(cb, ["src_b", "token"], "left")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            F.coalesce(F.col("o_a"), F.lit(0)).cast("long").alias("o_a"),
            F.coalesce(F.col("o_b"), F.lit(0)).cast("long").alias("o_b"),
        )
        .filter((F.col("o_a") + F.col("o_b")) > 0)
    )
    t = (F.col("o_a") + F.col("o_b")).cast("double")
    nn = (F.col("n_a") + F.col("n_b")).cast("double")
    e_a = (F.col("n_a").cast("double") * t) / nn
    e_b = (F.col("n_b").cast("double") * t) / nn
    da = F.col("o_a").cast("double") - e_a
    db = F.col("o_b").cast("double") - e_b
    term = (da * da) / e_a + (db * db) / e_b
    return (
        j.select(
            "src_a",
            "src_b",
            F.floor(term * F.lit(1000000.0)).cast("long").alias("_tm"),
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.sum("_tm").cast("long").alias("chi2_micro"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )


def source_divergence_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
    top_v: int = 200,
) -> str:
    """DuckDB twin of :func:`source_divergence` — identical census,
    vocabulary cap, grid, IEEE association, and per-term floor-to-micro
    before the exact integer sum."""
    from nlp_to_nosql_spark.functions.text import NORMALIZE_SQL

    norm = NORMALIZE_SQL.format(c=f"COALESCE({text_col}, '')")
    return (
        f"WITH words AS (SELECT {group_col}, string_split({norm}, ' ') "
        f"AS w FROM {table}), "
        f"tok AS (SELECT {group_col}, unnest(w) AS token FROM words), "
        f"tf AS (SELECT {group_col}, token, CAST(COUNT(*) AS BIGINT) "
        f"AS cnt FROM tok WHERE token <> '' GROUP BY 1, 2), "
        "vocab AS (SELECT token FROM (SELECT token, SUM(cnt) AS _tot "
        f"FROM tf GROUP BY 1 ORDER BY _tot DESC, token LIMIT {int(top_v)})), "
        "tfv AS (SELECT tf.* FROM tf JOIN vocab USING (token)), "
        f"totals AS (SELECT {group_col}, CAST(SUM(cnt) AS BIGINT) "
        f"AS n_total FROM tfv GROUP BY 1), "
        f"grid AS (SELECT a.{group_col} AS src_a, a.n_total AS n_a, "
        f"b.{group_col} AS src_b, b.n_total AS n_b, v.token "
        f"FROM totals a, totals b, vocab v "
        f"WHERE a.{group_col} < b.{group_col}), "
        "j AS (SELECT g.src_a, g.src_b, g.n_a, g.n_b, "
        "CAST(COALESCE(ca.cnt, 0) AS BIGINT) AS o_a, "
        "CAST(COALESCE(cb.cnt, 0) AS BIGINT) AS o_b "
        "FROM grid g "
        f"LEFT JOIN tfv ca ON ca.{group_col} = g.src_a "
        "AND ca.token = g.token "
        f"LEFT JOIN tfv cb ON cb.{group_col} = g.src_b "
        "AND cb.token = g.token "
        "WHERE COALESCE(ca.cnt, 0) + COALESCE(cb.cnt, 0) > 0), "
        "terms AS (SELECT src_a, src_b, CAST(FLOOR((("
        "(CAST(o_a AS DOUBLE) - (CAST(n_a AS DOUBLE) * "
        "CAST(o_a + o_b AS DOUBLE)) / CAST(n_a + n_b AS DOUBLE)) * "
        "(CAST(o_a AS DOUBLE) - (CAST(n_a AS DOUBLE) * "
        "CAST(o_a + o_b AS DOUBLE)) / CAST(n_a + n_b AS DOUBLE))) / "
        "((CAST(n_a AS DOUBLE) * CAST(o_a + o_b AS DOUBLE)) / "
        "CAST(n_a + n_b AS DOUBLE)) + "
        "((CAST(o_b AS DOUBLE) - (CAST(n_b AS DOUBLE) * "
        "CAST(o_a + o_b AS DOUBLE)) / CAST(n_a + n_b AS DOUBLE)) * "
        "(CAST(o_b AS DOUBLE) - (CAST(n_b AS DOUBLE) * "
        "CAST(o_a + o_b AS DOUBLE)) / CAST(n_a + n_b AS DOUBLE))) / "
        "((CAST(n_b AS DOUBLE) * CAST(o_a + o_b AS DOUBLE)) / "
        "CAST(n_a + n_b AS DOUBLE))) * 1000000.0) AS BIGINT) AS _tm "
        "FROM j) "
        "SELECT src_a, src_b, CAST(SUM(_tm) AS BIGINT) AS chi2_micro, "
        "CAST(COUNT(*) AS BIGINT) AS n_terms "
        "FROM terms GROUP BY 1, 2"
    )


def collocations_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> str:
    """DuckDB twin of :func:`bigram_collocations` — identical
    normalization, adjacency expansion, marginal re-aggregation, and
    IEEE association for ``lift_micro``."""
    from nlp_to_nosql_spark.functions.text import NORMALIZE_SQL

    norm = NORMALIZE_SQL.format(c=f"COALESCE({text_col}, '')")
    return (
        f"WITH words AS (SELECT {id_col}, string_split({norm}, ' ') AS w "
        f"FROM {table}), "
        "bg AS (SELECT w[i] AS w1, w[i + 1] AS w2 "
        "FROM words, UNNEST(range(1, len(w))) u(i)), "
        "pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair "
        "FROM bg GROUP BY 1, 2), "
        "fx AS (SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_first "
        "FROM pc GROUP BY 1), "
        "fy AS (SELECT w2, CAST(SUM(n_pair) AS BIGINT) AS n_second "
        "FROM pc GROUP BY 1), "
        "nn AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS n_bigrams FROM pc) "
        "SELECT pc.w1, pc.w2, pc.n_pair, fx.n_first, fy.n_second, "
        "nn.n_bigrams, "
        "CAST(FLOOR(((CAST(pc.n_pair AS DOUBLE) * "
        "CAST(nn.n_bigrams AS DOUBLE)) / "
        "(CAST(fx.n_first AS DOUBLE) * CAST(fy.n_second AS DOUBLE))) "
        "* 1000000.0) AS BIGINT) AS lift_micro "
        "FROM pc JOIN fx USING (w1) JOIN fy USING (w2) CROSS JOIN nn "
        f"WHERE pc.n_pair >= {int(min_count)}"
    )


def bm25_topk(
    df: DataFrame,
    query_terms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    topk_buckets: int = 8,
) -> DataFrame:
    """Distributed BM25 retrieval: top-``k`` documents per query —
    ``(query_id, rk, id, score_micro)``.

    The lexical-retrieval pass a training-data pipeline runs for RAG
    eval sets and hard-negative pools (the sparse complement of
    ``similarity.hard_negative_topk``).  Reference parity: the reference
    has no retrieval scoring (SURVEY §2.8 — absent); part of the
    beyond-reference LLM-pipeline extension set.

    ``query_terms`` is a small ``(query_id, token)`` frame (deduplicated
    here — a repeated term must not double-count).  Scoring is the
    Lucene BM25 variant: ``idf = ln(1 + (N − df + 0.5)/(df + 0.5))``
    (always positive) with the usual ``tf·(k1+1) / (tf + k1·(1 − b +
    b·dl/avgdl))`` saturation.  Each per-term score is floored to an
    integer micro (``floor(score·1e6)`` BIGINT) BEFORE the per-document
    sum, so the aggregate is a partition-order-free integer sum and the
    SQL twin is value-exact: every float op (sub, add, div, ln, mul,
    floor) is the same correctly-rounded IEEE double op in the same
    association on both engines (same discipline as
    ``bigram_collocations``; ``ln`` is the one op trusted to the two
    libms, and a disagreement would need a score within 1 ulp of a
    1e-6 grid line to surface).

    100 TB shape: ONE corpus-token-sized exchange — the (id, token)
    groupBy that builds the TF table.  Document length rides THROUGH
    that exchange: ``dl`` (non-empty token count, ``F.size`` of the
    filtered ``_words`` array — equal to ``sum(tf)`` per doc by
    construction) is derived in the SAME ``tokenized()`` projection the
    TF explode reads and carried as a grouping key (functionally
    dependent on the id, so counts are unchanged), which deletes the
    corpus-sized dl join the previous shape paid — candidates arrive at
    scoring already length-annotated.  The only other corpus pass is
    the (n_docs, total_tokens) global aggregate, a single narrow
    partial-agg scan.  The broadcast query-token join prunes TF to
    candidates before any scoring, and df for the query tokens is
    counted from that pruned table.  The final top-k never funnels a
    query's full candidate set through one reducer: a deterministic
    ``xxhash64`` salt splits each query into ``topk_buckets`` partial
    top-k windows, and the global window sees at most
    ``topk_buckets·k`` rows per query.
    """
    from nlp_to_nosql_spark.operators.dedup import tokenized

    words = tokenized(df, id_col, text_col)
    dl_expr = (
        F.size(F.filter(F.col("_words"), lambda x: x != F.lit("")))
        .cast("long")
        .alias("dl")
    )
    # dl MUST be computed in its own projection BELOW the explode:
    # Spark's ExtractGenerator places non-generator expressions in a
    # Project ABOVE the Generate, so putting dl_expr in the same select
    # as F.explode re-evaluates the O(doc_len) lambda filter once per
    # OUTPUT token row — O(tokens x doc_len) total, measured 2x wall
    # on the 100x probe.  Two selects pin it per-document.
    with_dl = words.select(F.col(id_col), dl_expr, F.col("_words"))
    toks = with_dl.select(
        F.col(id_col),
        F.col("dl"),
        F.explode(F.col("_words")).alias("token"),
    ).filter(F.col("token") != "")
    # dl is functionally dependent on the id: adding it to the grouping
    # key changes nothing but lets it ride the one corpus exchange
    tf = toks.groupBy(id_col, "dl", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    qterms = query_terms.select("query_id", "token").distinct()
    qtok = qterms.select("token").distinct()

    cand0 = tf.join(F.broadcast(qtok), "token")
    dfc = cand0.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    stats = words.select(dl_expr).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )

    nd = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    avgdl = F.col("total_tokens").cast("double") / nd
    idf = F.log(
        F.lit(1.0) + ((nd - dfd) + F.lit(0.5)) / (dfd + F.lit(0.5))
    )
    norm = tfd + F.lit(float(k1)) * (
        F.lit(1.0 - float(b)) + F.lit(float(b)) * (dld / avgdl)
    )
    term_micro = (
        F.floor(idf * ((tfd * F.lit(float(k1) + 1.0)) / norm) * F.lit(1000000.0))
        .cast("long")
    )

    scored = (
        cand0.join(F.broadcast(qterms), "token")
        .join(dfc, "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(F.sum(term_micro).cast("long").alias("score_micro"))
    )
    order = [F.desc("score_micro"), F.asc(id_col)]
    partial = Window.partitionBy(
        "query_id", F.pmod(F.xxhash64(F.col(id_col)), F.lit(topk_buckets))
    ).orderBy(*order)
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("_prk", F.row_number().over(partial))
        .filter(F.col("_prk") <= k)
        .withColumn("rk", F.row_number().over(final).cast("int"))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", id_col, "score_micro")
    )


def bm25_topk_sql(
    query_rows: "list[tuple[str, str]]",
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle twin of :func:`bm25_topk`.

    Float literals are injected via ``repr()`` of the SAME Python
    doubles the Column form uses (shortest-roundtrip decimals), so both
    engines evaluate bit-identical constants.
    """
    from nlp_to_nosql_spark.functions.text import NORMALIZE_SQL

    norm = NORMALIZE_SQL.format(c=text_col)

    def esc(s: str) -> str:
        # double embedded single quotes — a token like "don't" must not
        # break (or inject into) the oracle query
        return s.replace("'", "''")

    values = " UNION ALL ".join(
        f"SELECT '{esc(q)}' AS query_id, '{esc(t)}' AS token"
        for q, t in query_rows
    )
    c_k1 = repr(float(k1))
    c_tf = repr(float(k1) + 1.0)
    c_omb = repr(1.0 - float(b))
    c_b = repr(float(b))
    return (
        f"WITH words AS (SELECT {id_col}, string_split({norm}, ' ') AS w "
        f"FROM {table}), "
        f"toks AS (SELECT {id_col}, unnest(w) AS token FROM words), "
        f"tf AS (SELECT {id_col}, token, CAST(COUNT(*) AS BIGINT) AS tf "
        f"FROM toks WHERE token <> '' GROUP BY {id_col}, token), "
        f"q AS (SELECT DISTINCT query_id, token FROM ({values})), "
        "dfc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf "
        "WHERE token IN (SELECT DISTINCT token FROM q) GROUP BY token), "
        f"dl AS (SELECT {id_col}, CAST(len(list_filter(string_split("
        f"{norm}, ' '), x -> x <> '')) AS BIGINT) AS dl FROM {table}), "
        f"n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {table}), "
        "tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl), "
        f"scored AS (SELECT q.query_id, tf.{id_col}, "
        "CAST(FLOOR("
        "ln(1.0 + ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)) + 0.5) "
        "/ (CAST(df AS DOUBLE) + 0.5)) "
        f"* ((CAST(tf AS DOUBLE) * {c_tf}) / "
        f"(CAST(tf AS DOUBLE) + {c_k1} * ({c_omb} + {c_b} * "
        "(CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) "
        "/ CAST(n_docs AS DOUBLE)))))) "
        "* 1000000.0) AS BIGINT) AS term_micro "
        "FROM tf JOIN q USING (token) JOIN dfc USING (token) "
        f"JOIN dl USING ({id_col}) CROSS JOIN n CROSS JOIN tot), "
        f"agg AS (SELECT query_id, {id_col}, "
        "CAST(SUM(term_micro) AS BIGINT) AS score_micro "
        f"FROM scored GROUP BY query_id, {id_col}) "
        f"SELECT query_id, rk, {id_col}, score_micro FROM ("
        f"SELECT query_id, {id_col}, score_micro, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY query_id "
        f"ORDER BY score_micro DESC, {id_col}) AS INT) AS rk FROM agg) t "
        f"WHERE rk <= {int(k)}"
    )


# ---------------------------------------------------------------------------
# Zipf-slope corpus diagnostic
# ---------------------------------------------------------------------------


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    scale: int = 1_000,
) -> DataFrame:
    """Least-squares fit of the corpus's token rank-frequency curve in
    log-log space — the Zipf diagnostic a corpus health check runs: a
    clean natural-language corpus fits ``ln f ≈ a + s·ln r`` with slope
    ``s ≈ −1``; a large deviation (flat head, cliff tail) signals
    boilerplate flooding, dedup failure, or truncation (Piantadosi,
    Psychon Bull Rev 2014 reviews the law and its diagnostics).

    Exactness (the agg6 discipline — NOT the engines' regr_slope, whose
    streaming updates differ in last ulps): ``x = floor(ln(rank)·1e3)``
    and ``y = floor(ln(freq)·1e3)`` are MILLI-scaled integers (milli
    not micro so ``Σx²`` keeps int64 headroom to ~10⁹-type vocabularies:
    ln ≤ ~21 → x ≤ 21 000 → x² ≤ 4.4·10⁸ per row), all five sums are
    exact BIGINTs, and the closed-form slope/intercept/correlation are
    the same IEEE double expression in both engines
    (:func:`zipf_slope_sql`).  Rank ties break ``(freq DESC, token
    ASC)``.

    Returns one row ``(n_vocab, n_tokens, slope, intercept_milli_ln,
    corr)``; ``slope ≈ −1`` is the healthy reading.  Fewer than two
    distinct tokens yield a NULL fit (zero variance) on both engines.

    Scale: one corpus-token shuffle into the vocabulary frame; the rank
    window sorts the VOCABULARY (narrow (token, count) rows — never the
    corpus), then one global five-sum reduce to a single row.
    """
    from pyspark.sql import Window

    from nlp_to_nosql_spark.functions.text import normalize_text

    words = (
        df.select(
            F.explode(
                F.filter(
                    F.split(normalize_text(F.col(text_col)), " "),
                    lambda t: t != F.lit(""),
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )
    w_rank = Window.orderBy(F.col("wc").desc(), F.col("w").asc())
    ranked = words.select(
        F.row_number().over(w_rank).cast("long").alias("r"), "wc"
    ).select(
        F.floor(F.log(F.col("r").cast("double")) * F.lit(float(scale)))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("wc").cast("double")) * F.lit(float(scale)))
        .cast("long")
        .alias("y"),
        "wc",
    )
    sums = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("wc").cast("long").alias("n_tokens"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return sums.select(
        F.col("n").alias("n_vocab"),
        "n_tokens",
        F.when(var_x > 0, cov_n / var_x).alias("slope"),
        F.when(
            var_x > 0, (sy - (cov_n / var_x) * sx) / n
        ).alias("intercept_milli_ln"),
        F.when(
            (var_x > 0) & (var_y > 0),
            cov_n / (F.sqrt(var_x) * F.sqrt(var_y)),
        ).alias("corr"),
    )


def zipf_slope_sql(
    table: str = "documents",
    text_col: str = "text",
    scale: int = 1_000,
) -> str:
    """DuckDB twin of :func:`zipf_slope` — same milli-ln floors, same
    exact BIGINT sums, same closed-form double expressions."""
    from nlp_to_nosql_spark.functions.text import NORMALIZE_SQL

    norm = NORMALIZE_SQL.format(c=f"COALESCE({text_col}, '')")
    return (
        f"WITH toks AS (SELECT list_filter(string_split({norm}, ' '), "
        f"t -> t <> '') AS ts FROM {table}), "
        "words AS (SELECT f AS w, CAST(count(*) AS BIGINT) AS wc "
        "FROM toks, LATERAL UNNEST(ts) AS u(f) GROUP BY f), "
        "ranked AS (SELECT CAST(ROW_NUMBER() OVER "
        "(ORDER BY wc DESC, w ASC) AS BIGINT) AS r, wc FROM words), "
        "xy AS (SELECT "
        f"CAST(FLOOR(ln(CAST(r AS DOUBLE)) * {float(scale)!r}) AS BIGINT) "
        "AS x, "
        f"CAST(FLOOR(ln(CAST(wc AS DOUBLE)) * {float(scale)!r}) AS BIGINT) "
        "AS y, wc FROM ranked), "
        "sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(wc) AS BIGINT) AS n_tokens, "
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(x * x) AS BIGINT) AS sxx, "
        "CAST(SUM(y * y) AS BIGINT) AS syy, "
        "CAST(SUM(x * y) AS BIGINT) AS sxy FROM xy) "
        "SELECT n AS n_vocab, n_tokens, "
        "CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - "
        "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN "
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - "
        "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - "
        "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS slope, "
        "CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - "
        "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN "
        "(CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - "
        "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - "
        "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)) / "
        "CAST(n AS DOUBLE) END AS intercept_milli_ln, "
        "CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - "
        "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 AND "
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - "
        "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN "
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - "
        "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
        "(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - "
        "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * "
        "sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - "
        "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS corr "
        "FROM sums"
    )
