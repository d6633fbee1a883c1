"""Retrieval-quality evaluation: recall@k / MRR over ranked result lists.

The measurement step a training-data pipeline runs after building a
retrieval index (BM25 ``terms.bm25_topk``, dense ``similarity.*`` top-k,
or any ``(query_id, rk, id)`` ranking): join the ranked lists against a
relevance-judgment table and emit per-query hit counts, recall@k and
MRR — the numbers a RAG eval set or hard-negative miner is tuned on.

Reference scope note: the reference engine (No_Sql.py) has no retrieval
or evaluation support; this belongs to the driver-mandated
LLM-data-pipeline extension surface (SURVEY.md §2 extensions).

Determinism discipline: both metrics are emitted as integer micros via
BIGINT floor division (``hits·10⁶ div n_rel``, ``10⁶ div first_rank``) —
no float ever forms, so the DuckDB twin (``//``) is value-exact by
construction.

Scale shape: the ranked input is already top-k-bounded per query (the
upstream retriever's job — e.g. ``bm25_topk``'s salted two-stage
window), so every frame here is #queries-proportional except ``qrels``,
which joins on its natural ``(query, id)`` key and partially aggregates
to one row per (query, doc) before anything wide.  No corpus scan
happens in this module at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 5,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-query retrieval quality over a ranked result table.

    ``results`` holds ranked lists ``(query_col, rk, id_col, ...)`` with
    ``rk`` 1-based (the shape ``bm25_topk`` / the ANN top-k family
    emit); ``qrels`` holds the relevant ``(query_col, id_col)`` pairs.
    Returns ``(query_col, n_rel, hits, recall_micro, mrr_micro)``:

    * ``hits`` — relevant documents among the top ``k`` results;
    * ``recall_micro`` — ``floor(10⁶ · hits / n_rel)`` (BIGINT floor
      division, exact);
    * ``mrr_micro`` — ``floor(10⁶ / rank-of-first-hit)``, 0 when no
      relevant document was retrieved.

    Queries with no relevance judgments are excluded (recall undefined
    without a denominator); queries judged but missed entirely appear
    with ``hits = 0``.
    """
    topk = results.filter(F.col("rk") <= int(k)).select(
        query_col, "rk", id_col
    )
    nrel = qrels.select(query_col, id_col).groupBy(query_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    hit = (
        topk.join(qrels.select(query_col, id_col), [query_col, id_col])
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("hits"),
            F.min("rk").cast("long").alias("_first"),
        )
    )
    return (
        nrel.join(hit, query_col, "left")
        .select(
            query_col,
            "n_rel",
            F.coalesce(F.col("hits"), F.lit(0).cast("long")).alias("hits"),
            F.expr("(coalesce(hits, 0L) * 1000000L) div n_rel")
            .cast("long")
            .alias("recall_micro"),
            F.coalesce(
                F.expr("1000000L div _first"), F.lit(0).cast("long")
            ).alias("mrr_micro"),
        )
    )


def retrieval_metrics_sql(
    results_sql: str,
    qrels_sql: str,
    k: int = 5,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`retrieval_metrics`: wrap any ranked-list
    SQL (e.g. ``bm25_topk_sql``) and any relevance SQL as CTE blocks and
    replay the BIGINT-floor-division metrics (``//`` ≡ Spark ``div`` for
    the non-negative operands here)."""
    return (
        f"WITH res AS (SELECT {query_col}, rk, {id_col} "
        f"FROM ({results_sql}) r WHERE rk <= {int(k)}), "
        f"qr AS (SELECT {query_col}, {id_col} FROM ({qrels_sql}) s), "
        f"nrel AS (SELECT {query_col}, CAST(COUNT(*) AS BIGINT) AS n_rel "
        f"FROM qr GROUP BY {query_col}), "
        f"hit AS (SELECT {query_col}, CAST(COUNT(*) AS BIGINT) AS hits, "
        f"CAST(MIN(rk) AS BIGINT) AS first_rk "
        f"FROM res JOIN qr USING ({query_col}, {id_col}) "
        f"GROUP BY {query_col}) "
        f"SELECT nrel.{query_col}, n_rel, "
        "CAST(coalesce(hits, 0) AS BIGINT) AS hits, "
        "CAST((coalesce(hits, 0) * 1000000) // n_rel AS BIGINT) "
        "AS recall_micro, "
        "CAST(coalesce(1000000 // first_rk, 0) AS BIGINT) AS mrr_micro "
        f"FROM nrel LEFT JOIN hit USING ({query_col})"
    )
