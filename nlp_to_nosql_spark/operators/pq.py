"""Product quantization (PQ) — compressed vector codes + ADC search.

The memory tier below scalar int8 quantization
(:func:`similarity.quantize_embeddings`): split each embedding into
``m`` subvectors, map every subvector to the nearest of ``k`` per-
subspace centroids, and store only the ``m`` small codes (m=4, k=16 →
16 bits per 64-dim vector, a 128× compression).  Search runs in the
compressed domain with an Asymmetric Distance Computation (ADC) lookup
table — the IVF-PQ recipe of Jégou et al., "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011).

Determinism / oracle design: every distance is computed on
**integer-micro** components (``floor(x·1e6)`` per dimension, the
``label_centroids`` discipline), so assignments and ADC distances are
exact BIGINT arithmetic both engines replay bit-for-bit.  The codebook
is a *sampled* codebook: ``k`` deterministically-chosen corpus vectors
(seeded md5 bucket of the id, min id per bucket — the IVF hash-spread
init) rather than Lloyd-iterated centroids.  Production PQ would refine
it with per-subspace k-means (``ivf.IVFIndex`` demonstrates the Lloyd
loop); the sampled codebook keeps the END-TO-END pipeline value-level
oracle-checkable, and recall vs the exact ranking is a measured number
(tests/test_pq.py).

Scale shape: the codebook is k·dim micros — a bounded driver collect
(16×64 here; the same contract as ``IVFIndex.fit``) baked into the plan
as literals.  Encode is a ZERO-SHUFFLE projection (the 100 TB corpus
never moves); ADC search is a zero-shuffle projection over the codes
table + ``TakeOrderedAndProject`` (k rows per partition move, never
vectors).  The micro array is staged in its own projection so the
per-centroid aggregate lambdas reference a cheap attribute (Catalyst
does not CSE across higher-order-function lambda bodies).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nlp_to_nosql_spark.operators.dedup import md5_hash28

_MICRO = 1_000_000


def _pq_bucket(id_col: F.Column, k: int, seed: int) -> F.Column:
    """Seeded md5 bucket in [0, k) — deterministic, engine-portable."""
    return (
        md5_hash28(F.concat(F.lit(f"pq{seed}:"), id_col.cast("string"))) % k
    )


def _pq_bucket_sql(c: str, k: int, seed: int) -> str:
    return (
        f"CAST(CAST('0x' || substr(md5('pq{seed}:' || "
        f"CAST({c} AS VARCHAR)), 1, 7) AS UBIGINT) % {k} AS BIGINT)"
    )


@dataclass
class PQModel:
    """Fitted sampled codebook: ``centroids[j]`` is the full-dim
    integer-micro vector of the j-th sample (j dense over non-empty
    hash buckets in bucket order); subspace ``s`` uses dims
    ``[s*sub_dim, (s+1)*sub_dim)``."""

    m: int
    k: int
    dim: int
    seed: int
    centroids: list[list[int]]

    @property
    def sub_dim(self) -> int:
        return self.dim // self.m


def fit_pq(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    seed: int = 7,
) -> PQModel:
    """Select the sampled codebook (bounded collect: ≤ k rows × dim).

    ``min_by(vec, id)`` per hash bucket — one partially-aggregated
    groupBy over (bucket, id, vec) triples; empty buckets simply yield
    fewer centroids (codes stay dense 0..k_eff-1).
    """
    rows = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_b", _pq_bucket(F.col("_id"), k, seed))
        .groupBy("_b")
        .agg(F.min_by("_v", "_id").alias("_v"))
        .orderBy("_b")
        .collect()
    )
    if not rows:
        raise ValueError("cannot fit a PQ codebook on an empty corpus")
    cents = [
        [math.floor(float(x) * _MICRO) for x in r["_v"]] for r in rows
    ]
    dim = len(cents[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    return PQModel(m=m, k=k, dim=dim, seed=seed, centroids=cents)


def _micro_col(vec_col: str) -> F.Column:
    return F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * F.lit(_MICRO)).cast("long"),
    )


def pq_encode(
    df: DataFrame,
    model: PQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector: ``(id, codes array<int>)`` with ``codes[s]``
    = index of the nearest subspace-``s`` centroid by exact integer-
    micro squared distance (ties → lowest index, via first-match
    ``array_position``).  Zero shuffle."""
    d0 = model.sub_dim
    staged = df.select(
        F.col(id_col), _micro_col(vec_col).alias("_vm")
    )
    codes = []
    for s in range(model.m):
        sub = F.slice(F.col("_vm"), s * d0 + 1, d0)
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(
                            *[
                                F.lit(c).cast("long")
                                for c in cent[s * d0 : (s + 1) * d0]
                            ]
                        ),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                )
                for cent in model.centroids
            ]
        )
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias(f"_c{s}")
        )
    return staged.select(
        F.col(id_col), F.array(*codes).alias("codes")
    )


def adc_topk(
    df: DataFrame,
    model: PQModel,
    query: Sequence[float],
    k_results: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k nearest by ADC: per-subspace query→centroid distances form
    an m×k lookup table (computed driver-side on the SAME integer-micro
    arithmetic, baked in as literals); each row's approximate distance
    is ``Σ_s lut[s][codes[s]]`` — m array lookups and adds per row, no
    vector math in the scan.  Output ``(id, adc_dist)``, ascending,
    ties → lowest id."""
    d0 = model.sub_dim
    qm = [math.floor(float(x) * _MICRO) for x in query]
    if len(qm) != model.dim:
        raise ValueError(f"query dim {len(qm)} != model dim {model.dim}")
    lut = [
        [
            sum(
                (qm[s * d0 + i] - cent[s * d0 + i]) ** 2
                for i in range(d0)
            )
            for cent in model.centroids
        ]
        for s in range(model.m)
    ]
    encoded = pq_encode(df, model, id_col, vec_col)
    dist = None
    for s in range(model.m):
        term = F.element_at(
            F.array(*[F.lit(v).cast("long") for v in lut[s]]),
            F.element_at(F.col("codes"), s + 1) + 1,
        )
        dist = term if dist is None else dist + term
    return (
        encoded.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(int(k_results))
    )


def adc_rerank_topk(
    df: DataFrame,
    model: PQModel,
    query: Sequence[float],
    k_results: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage PQ search — the production deployment of ADC: a cheap
    compressed-domain shortlist (``shortlist`` candidates by ADC), then
    an EXACT integer-micro squared-L2 rerank of only those candidates.
    Recall is set by the shortlist depth, cost by the codes scan — the
    classic IVF-PQ + rerank architecture.

    Plan: the shortlist (≤ ``shortlist`` rows) joins back to the corpus
    — Spark broadcasts it (AQE sees the limit), so the rerank is a
    broadcast semi-join + zero-shuffle exact distance projection +
    ``TakeOrderedAndProject``.  Output ``(id, exact_dist)`` ascending,
    ties → lowest id; every distance is exact BIGINT."""
    qm = [math.floor(float(x) * _MICRO) for x in query]
    cand = adc_topk(
        df, model, query, k_results=shortlist, id_col=id_col, vec_col=vec_col
    ).select(id_col)
    qlit = F.array(*[F.lit(v).cast("long") for v in qm])
    exact = (
        df.join(F.broadcast(cand), id_col)
        .select(F.col(id_col), _micro_col(vec_col).alias("_vm"))
        .select(
            F.col(id_col),
            F.aggregate(
                F.zip_with(
                    F.col("_vm"), qlit, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("exact_dist"),
        )
    )
    return exact.orderBy(
        F.col("exact_dist").asc(), F.col(id_col).asc()
    ).limit(int(k_results))


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

def _pq_ctes(
    table: str, id_col: str, vec_col: str, m: int, k: int, seed: int, d0: int
) -> str:
    """Shared CTE chain: micro vectors → sampled codebook (dense j over
    non-empty buckets in bucket order) → per-(vec, subspace, centroid)
    exact distances → per-(vec, subspace) best code."""
    bucket = _pq_bucket_sql(id_col, k, seed)
    return (
        f"vm AS (SELECT {id_col}, list_transform({vec_col}, "
        f"v -> CAST(FLOOR(CAST(v AS DOUBLE) * {_MICRO}) AS BIGINT)) AS vm "
        f"FROM {table}), "
        f"bk AS (SELECT {id_col}, vm, {bucket} AS b FROM vm), "
        f"pick AS (SELECT b, MIN({id_col}) AS cid FROM bk GROUP BY b), "
        f"cvec AS (SELECT CAST(row_number() OVER (ORDER BY p.b) - 1 "
        f"AS BIGINT) AS j, s.vm AS cm "
        f"FROM pick p JOIN bk s ON s.{id_col} = p.cid), "
        f"dist AS (SELECT v.{id_col}, ss.s, c.j, "
        f"list_sum([(v.vm[ss.s * {d0} + i] - c.cm[ss.s * {d0} + i]) * "
        f"(v.vm[ss.s * {d0} + i] - c.cm[ss.s * {d0} + i]) "
        f"for i in range(1, {d0 + 1})]) AS d "
        f"FROM vm v, cvec c, (SELECT unnest(range({m})) AS s) ss), "
        f"best AS (SELECT {id_col}, s, j, "
        f"row_number() OVER (PARTITION BY {id_col}, s ORDER BY d, j) AS rn "
        f"FROM dist)"
    )


def pq_codes_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    seed: int = 7,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`fit_pq` + :func:`pq_encode` — the codebook
    is DERIVED inside the query (same hash buckets, same min-id picks),
    so the oracle is self-contained end-to-end."""
    d0 = dim // m
    return (
        "WITH "
        + _pq_ctes(table, id_col, vec_col, m, k, seed, d0)
        + f" SELECT {id_col}, "
        f"list(CAST(j AS INTEGER) ORDER BY s) AS codes "
        f"FROM best WHERE rn = 1 GROUP BY {id_col}"
    )


def adc_topk_sql(
    query_id: int = 0,
    k_results: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    seed: int = 7,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`adc_topk` with the query row (``id =
    query_id``) micro-quantized inside the query — lookup table and ADC
    sum are the same exact integers as the Spark literals."""
    d0 = dim // m
    return (
        "WITH "
        + _pq_ctes(table, id_col, vec_col, m, k, seed, d0)
        + f", q AS (SELECT vm AS qm FROM vm WHERE {id_col} = {query_id}), "
        f"lut AS (SELECT ss.s, c.j, "
        f"list_sum([(q.qm[ss.s * {d0} + i] - c.cm[ss.s * {d0} + i]) * "
        f"(q.qm[ss.s * {d0} + i] - c.cm[ss.s * {d0} + i]) "
        f"for i in range(1, {d0 + 1})]) AS dq "
        f"FROM q, cvec c, (SELECT unnest(range({m})) AS s) ss) "
        f"SELECT b.{id_col}, CAST(SUM(l.dq) AS BIGINT) AS adc_dist "
        f"FROM best b JOIN lut l ON l.s = b.s AND l.j = b.j "
        f"WHERE b.rn = 1 GROUP BY b.{id_col} "
        f"ORDER BY adc_dist, b.{id_col} LIMIT {int(k_results)}"
    )


def adc_rerank_sql(
    query_id: int = 0,
    k_results: int = 10,
    shortlist: int = 50,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    seed: int = 7,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`adc_rerank_topk` — the ADC shortlist CTE is
    :func:`adc_topk_sql`'s ranking, the rerank the same exact
    integer-micro squared L2."""
    adc = adc_topk_sql(
        query_id, shortlist, table, id_col, vec_col, m, k, seed, dim
    )
    return (
        f"WITH cand AS ({adc}), "
        f"vm2 AS (SELECT {id_col}, list_transform({vec_col}, "
        f"v -> CAST(FLOOR(CAST(v AS DOUBLE) * {_MICRO}) AS BIGINT)) AS vm "
        f"FROM {table}), "
        f"q2 AS (SELECT vm AS qm FROM vm2 WHERE {id_col} = {query_id}) "
        f"SELECT v.{id_col}, "
        f"CAST(list_sum([(v.vm[i] - q2.qm[i]) * (v.vm[i] - q2.qm[i]) "
        f"for i in range(1, {dim + 1})]) AS BIGINT) AS exact_dist "
        f"FROM vm2 v JOIN cand c ON v.{id_col} = c.{id_col}, q2 "
        f"ORDER BY exact_dist, v.{id_col} LIMIT {int(k_results)}"
    )
