"""SemDeDup: semantic deduplication via clustered embedding near-dup pruning.

Re-expresses the SemDeDup pipeline (Abbas et al., "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540)
Spark-first.  The idea: exact all-pairs cosine over a corpus is O(n²);
cluster the embeddings first (k cells), then search for semantic
near-duplicates only WITHIN each cell — the quadratic term drops to
O(k · (n/k)²) = O(n²/k), and each cell's comparison is one dense numpy
matmul inside ``applyInPandas``.

Plan shape (the 100 TB story):

* centroid load — bounded driver collect of ``n_clusters`` rows (same
  contract as :class:`~nlp_to_nosql_spark.operators.ivf.IVFIndex`:
  centroids are k×dim driver-resident floats; the corpus never is);
* assignment — ONE zero-shuffle scan: an Arrow-batched pandas UDF doing
  a single int64 matmul per batch (argmax over exact integer-micro dot
  products, so the cell id is engine-reproducible — no float argmax
  near-tie can flip between Spark and the DuckDB oracle);
* within-cell pairs — ONE shuffle keyed on ``(cluster_id, sub-block
  pair)``; each group computes a normalized float64 matmul and keeps
  pairs with ``round(cos, 6) ≥ threshold`` (identical rounding contract
  to :func:`~nlp_to_nosql_spark.operators.similarity.embedding_neardup_exact`).
  At corpus scale ``n_clusters`` grows with n (10⁴–10⁵ cells), keeping
  every cell bounded — and a pathologically skewed cell (one cluster
  absorbing a large corpus fraction) is SUB-BLOCKED with the same
  block-pair replication ``embedding_neardup_exact`` uses: rows of a
  cell larger than ``cell_block_size`` hash into ⌈cell/cbs⌉ sub-blocks
  and replicate to every unordered sub-block pair, so no single Python
  worker ever materializes more than an O(cell_block_size²) similarity
  matrix regardless of skew (enforced by the skewed-fixture test in
  ``tests/test_semdedup.py``);
* keep/drop — lower-id-wins within a near-dup pair (the same
  deterministic stand-in for SemDeDup's "keep one per group" that the
  exact-dedup family uses), emitted as a ``kept`` flag via one
  broadcast-sized left join on the distinct drop list.

The CONTRACT configuration freezes the centroids to the ``n_clusters``
lowest-id vectors so the whole pipeline — assignment argmax included —
replays relationally in DuckDB (:func:`semantic_dedup_sql`).  Production
callers pass ``centroids=`` from a sampled
:meth:`~nlp_to_nosql_spark.operators.ivf.IVFIndex.fit` instead; the plan
is identical, only the k×dim matrix changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: floor-scale factor for integer-micro dot products (the repo-wide
#: determinism discipline: float32 → float64 is exact, ×1e6 and floor are
#: single IEEE ops, so numpy and DuckDB produce bit-equal BIGINTs).
_MICRO = 1_000_000


def _micro_matrix(vecs: pd.Series, dim: int) -> np.ndarray:
    """float vectors → exact int64 micro matrix; ragged input fails loudly.

    Mirrors the IntSRPLSH ragged guard: a vector whose length differs from
    the centroid dim would silently zip-truncate in a HOF form — here it
    raises instead of diverging.
    """
    rows = vecs.tolist()
    if not rows:
        return np.empty((0, dim), dtype=np.int64)
    try:
        x = np.asarray(rows, dtype=np.float64)
    except ValueError as exc:  # ragged: numpy refuses the rectangular cast
        raise ValueError(
            f"semantic_dedup: ragged embedding column (expected dim={dim})"
        ) from exc
    if x.ndim != 2 or x.shape[1] != dim:
        raise ValueError(
            f"semantic_dedup: ragged or mis-sized embedding (expected dim={dim})"
        )
    return np.floor(x * _MICRO).astype(np.int64)


def _sub_blocked(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    cell_block_size: int,
) -> DataFrame:
    """Replicate each row to every unordered sub-block pair of its cell.

    A cell with ``n`` rows hashes into ``⌈n / cell_block_size⌉``
    sub-blocks (id-hash, so no extra pass over the data is needed to
    split it); each row then explodes to every unordered pair containing
    its sub-block — ``embedding_neardup_exact``'s block-pair scheme
    (``similarity.py``) applied per cell.  Cells at or under
    ``cell_block_size`` get exactly one ``(0, 0)`` group, i.e. zero
    replication — the skew machinery costs nothing when there is no
    skew.  The per-cell sizes aggregate is one partial-agg shuffle
    emitting ``n_clusters`` rows, broadcast back onto the corpus.
    """
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("_cell_n")
    )
    return (
        assigned.join(F.broadcast(sizes), "cluster_id")
        .withColumn(
            "_nsub",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("_cell_n") / F.lit(int(cell_block_size))),
            ).cast("int"),
        )
        .withColumn(
            "_sb",
            F.pmod(F.xxhash64(F.col(id_col)), F.col("_nsub")).cast("int"),
        )
        .select(
            "cluster_id",
            id_col,
            vec_col,
            "_sb",
            F.explode(
                F.sequence(F.lit(0), F.col("_nsub") - F.lit(1))
            ).alias("_other"),
        )
        .select(
            "cluster_id",
            id_col,
            vec_col,
            "_sb",
            F.least("_sb", "_other").alias("_pa"),
            F.greatest("_sb", "_other").alias("_pb"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    cell_block_size: int = 4096,
    fit: str | None = None,
) -> DataFrame:
    """SemDeDup keep/drop decisions: ``(id, cluster_id, kept)`` per vector.

    ``kept`` is False iff some SAME-CLUSTER vector with a smaller id has
    ``round(cosine, 6) ≥ threshold`` against this one (lower-id-wins, the
    chain semantics of the exact-dedup family).  ``centroids`` defaults to
    the ``n_clusters`` LOWEST-ID vectors (truly the lowest ids — an
    ``ORDER BY id LIMIT n`` top-k, robust to id offsets and gaps), the
    oracle-replayable contract config; ``cluster_id`` is then the actual
    id of the winning centroid row, matching :func:`semantic_dedup_sql`
    for any id domain.  Pass a fitted k×dim float matrix for production
    use — ``cluster_id`` is the 0-based centroid index in that case.

    ``fit="sampled_kmeans"`` is the PRODUCTION centroid source Abbas et
    al. cluster with: a deterministic sampled Lloyd's fit
    (:class:`~nlp_to_nosql_spark.operators.ivf.IVFIndex` — hash-spread
    seeded init, training capped at ``spark.nlp2nosql.ivf.trainCap``
    rows, so the fit cost is sample-proportional at any corpus size).
    Cell quality decides dedup recall: near-duplicates only compare if
    they land in the SAME cell, and fitted cells track the data's
    actual density instead of whatever region the lowest ids came from
    — measured within-cell pair recall vs the exact ``dedup5`` pair set
    is in PERFORMANCE.md ("SemDeDup centroid quality").  The plan is
    identical either way; only the k×dim matrix changes.

    ``cell_block_size`` bounds per-task memory under cluster skew (see
    :func:`_sub_blocked`); it never changes the result, only the
    partitioning of the within-cell comparisons.
    """
    if fit is not None:
        if fit != "sampled_kmeans":
            raise ValueError(
                f"semantic_dedup: unknown fit {fit!r} "
                "(expected 'sampled_kmeans')"
            )
        if centroids is not None:
            raise ValueError(
                "semantic_dedup: pass either centroids= or fit=, not both"
            )
        from nlp_to_nosql_spark.operators.ivf import IVFIndex

        index = IVFIndex(n_lists=n_clusters)
        index.fit(df, id_col=id_col, vec_col=vec_col)
        centroids = index.centroids
    narrow = df.select(id_col, vec_col)
    if centroids is None:
        # top-k by id, not filter(id < n): TakeOrderedAndProject, no full
        # sort, and correct when ids are offset or gapped (round-7 advice).
        rows = narrow.orderBy(id_col).limit(n_clusters).collect()
        if len(rows) < n_clusters:
            raise ValueError(
                f"semantic_dedup: no centroid rows — found {len(rows)} of "
                f"the n_clusters={n_clusters} lowest-id vectors "
                "(empty or undersized input?)"
            )
        centroid_ids = np.asarray([r[id_col] for r in rows], dtype=np.int64)
        centroids = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    else:
        centroids = np.asarray(centroids, dtype=np.float64)
        centroid_ids = np.arange(centroids.shape[0], dtype=np.int64)
    cents_micro = np.floor(centroids * _MICRO).astype(np.int64)
    dim = cents_micro.shape[1]

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def assign(vecs: pd.Series) -> pd.Series:
        m = _micro_matrix(vecs, dim)
        # exact int64 dots: |micro| ≤ ~2²⁰ per component, dim ≤ 2¹² keeps
        # every dot far inside int64; argmax ties → first maximum, i.e.
        # the lowest centroid id (rows are id-ordered), mirroring the
        # oracle's ORDER BY dot DESC, c_id.
        dots = m @ cents_micro.T
        return pd.Series(centroid_ids[dots.argmax(axis=1)])

    from nlp_to_nosql_spark.plans.caching import persisted

    # the assignment frame feeds the cell-size aggregate, the pair search,
    # and the final keep/drop join — persist so the matmul scan runs once
    # (storage level conf'd via spark.nlp2nosql.cache.vectors).
    assigned = persisted(
        narrow.withColumn("cluster_id", assign(F.col(vec_col))), "vectors"
    )

    thr = float(threshold)

    def in_cell_pairs(key, pdf):
        cluster_id, pa, pb = key
        ids = pdf[id_col].to_numpy()
        x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0] = np.inf  # zero vectors: cosine defined as 0
        x = x / norms[:, None]
        if pa == pb:
            # one sub-block against itself: symmetric matmul, upper
            # triangle via id order
            sims = np.round(x @ x.T, 6)
            ia, ib = np.nonzero(sims >= thr)
            keep = ids[ia] < ids[ib]
            lo, hi = ids[ia][keep], ids[ib][keep]
            vals = sims[ia, ib][keep]
        else:
            # cross-block: each unordered row pair meets in exactly one
            # (pa, pb) group, so emit every hit (ordered lo < hi)
            in_a = (pdf["_sb"] == pa).to_numpy()
            xa, xb = x[in_a], x[~in_a]
            ids_a, ids_b = ids[in_a], ids[~in_a]
            sims = np.round(xa @ xb.T, 6)
            ia, ib = np.nonzero(sims >= thr)
            lo = np.minimum(ids_a[ia], ids_b[ib])
            hi = np.maximum(ids_a[ia], ids_b[ib])
            vals = sims[ia, ib]
        return pd.DataFrame(
            {
                "id_a": lo,
                "id_b": hi,
                "cluster_id": np.full(len(lo), cluster_id, dtype=np.int64),
                "cos_sim": vals,
            }
        )

    pairs = (
        _sub_blocked(assigned, id_col, vec_col, cell_block_size)
        .groupBy("cluster_id", "_pa", "_pb")
        .applyInPandas(
            in_cell_pairs,
            "id_a long, id_b long, cluster_id long, cos_sim double",
        )
    )

    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return (
        assigned.select(id_col, "cluster_id")
        # drop list ≤ corpus and usually ≪ it → broadcast-sized in the
        # common case; Spark's AQE picks broadcast vs shuffle from the
        # actual size, so no hint is hard-coded.
        .join(drops.withColumn("_dropped", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("kept"),
        )
    )


def semantic_dedup_sql(
    n_clusters: int = 8,
    threshold: float = 0.4,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`semantic_dedup` at the contract config —
    relational replay of the integer-micro assignment argmax (dot desc,
    centroid-id asc) against the ``n_clusters`` lowest-id vectors
    (``ORDER BY id LIMIT n``, the same top-k the Spark side collects),
    the within-cell round-6 cosine pairs, and the lower-id-wins drop
    list.  ``cluster_id`` is the actual centroid row id on both engines.

    Note on the threshold comparison: ``np.round`` is half-to-even while
    DuckDB ``ROUND`` is half-away-from-zero, so a cosine landing EXACTLY
    on a 1e-6 grid midpoint could in principle round differently — the
    inherited contract of the whole neardup family
    (``embedding_neardup_exact`` et al.), kept identical here rather
    than diverging from it; thresholds are chosen off-grid in the
    contract queries."""
    return (
        f"WITH m AS (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v, "
        f"list_transform(CAST({vec_col} AS DOUBLE[]), "
        "x -> CAST(FLOOR(x * 1000000) AS BIGINT)) AS mv "
        f"FROM {table}), "
        f"cents AS (SELECT {id_col} AS c_id, mv AS cv FROM m "
        f"ORDER BY {id_col} LIMIT {n_clusters}), "
        f"mx AS (SELECT {id_col}, CAST(i AS BIGINT) AS j, mv[i + 1] AS x "
        "FROM m, UNNEST(range(0, len(mv))) u(i)), "
        "cx AS (SELECT c_id, CAST(i AS BIGINT) AS j, cv[i + 1] AS c "
        "FROM cents, UNNEST(range(0, len(cv))) u(i)), "
        f"dots AS (SELECT mx.{id_col}, cx.c_id, SUM(mx.x * cx.c) AS dot "
        f"FROM mx JOIN cx ON cx.j = mx.j GROUP BY mx.{id_col}, cx.c_id), "
        f"assign AS (SELECT {id_col}, c_id AS cluster_id FROM dots "
        f"QUALIFY ROW_NUMBER() OVER (PARTITION BY {id_col} "
        "ORDER BY dot DESC, c_id) = 1), "
        f"pairs AS (SELECT sb.{id_col} AS id_b "
        "FROM assign sa JOIN assign sb ON sa.cluster_id = sb.cluster_id "
        f"AND sa.{id_col} < sb.{id_col} "
        f"JOIN m a ON a.{id_col} = sa.{id_col} "
        f"JOIN m b ON b.{id_col} = sb.{id_col} "
        f"WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {threshold}) "
        f"SELECT s.{id_col}, CAST(s.cluster_id AS BIGINT) AS cluster_id, "
        "(d.id_b IS NULL) AS kept "
        "FROM assign s LEFT JOIN (SELECT DISTINCT id_b FROM pairs) d "
        f"ON d.id_b = s.{id_col}"
    )
