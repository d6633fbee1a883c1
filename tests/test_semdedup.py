"""SemDeDup: clustered semantic dedup — assignment exactness, within-cell
pair semantics, lower-id-wins keep/drop, and the ragged guard."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nlp_to_nosql_spark.operators.semdedup import _MICRO, semantic_dedup

DIM = 8


def _df(spark, vecs):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], schema
    )


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(40, DIM).astype(np.float32)
    # vec 9 ≈ vec 0 (cosine ~1) and vec 17 = 2.5 * vec 0 (cosine exactly 1)
    vecs[9] = vecs[0] + rng.randn(DIM).astype(np.float32) * 0.005
    vecs[17] = vecs[0] * 2.5
    return vecs, _df(spark, vecs)


def _numpy_assign(vecs, n_clusters):
    m = np.floor(vecs.astype(np.float64) * _MICRO).astype(np.int64)
    cents = m[:n_clusters]
    return (m @ cents.T).argmax(axis=1)


def test_assignment_matches_numpy_model(planted):
    vecs, df = planted
    rows = semantic_dedup(df, n_clusters=4, threshold=0.99).collect()
    want = _numpy_assign(vecs, 4)
    got = {r["vec_id"]: r["cluster_id"] for r in rows}
    assert got == {i: int(want[i]) for i in range(len(vecs))}


def test_lower_id_wins_within_cell(planted):
    vecs, df = planted
    kept = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(df, n_clusters=4, threshold=0.99).collect()
    }
    assign = _numpy_assign(vecs, 4)
    # the planted dups of vec 0: any that share vec 0's cell must be
    # dropped (vec 0 is the lowest id); vec 0 itself survives
    assert kept[0] is True
    for j in (9, 17):
        if assign[j] == assign[0]:
            assert kept[j] is False


def test_no_pairs_below_threshold_all_kept(spark):
    # mutually near-orthogonal unit vectors: no cosine reaches 0.9
    vecs = np.eye(6, DIM, dtype=np.float32) + 0.01
    rows = semantic_dedup(_df(spark, vecs), n_clusters=2, threshold=0.9).collect()
    assert all(r["kept"] for r in rows)


def test_cross_cell_dups_are_not_compared(spark):
    # v_a and v_b have cosine ~0.62 (>= 0.4) but argmax-assign to
    # DIFFERENT cells of the explicit axis centroids — SemDeDup by
    # construction only prunes within a cell, so both survive.
    v_a = np.zeros(DIM, dtype=np.float32)
    v_a[0] = 1.0
    v_b = np.zeros(DIM, dtype=np.float32)
    v_b[0], v_b[1] = 0.8, 1.0
    cos = float(v_a @ v_b / (np.linalg.norm(v_a) * np.linalg.norm(v_b)))
    assert 0.4 <= round(cos, 6) < 0.99
    cents = np.eye(2, DIM)
    rows = semantic_dedup(
        _df(spark, [v_a, v_b]), threshold=0.4, centroids=cents
    ).collect()
    by_id = {r["vec_id"]: r for r in rows}
    assert by_id[0]["cluster_id"] == 0 and by_id[1]["cluster_id"] == 1
    assert by_id[0]["kept"] is True and by_id[1]["kept"] is True
    # same data, ONE cell → the pair IS compared and the higher id drops
    one_cell = semantic_dedup(
        _df(spark, [v_a, v_b]), threshold=0.4, centroids=cents[:1]
    ).collect()
    kept = {r["vec_id"]: r["kept"] for r in one_cell}
    assert kept == {0: True, 1: False}


def test_explicit_centroids_param(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(12, DIM).astype(np.float32)
    cents = rng.randn(3, DIM)
    rows = semantic_dedup(
        _df(spark, vecs), threshold=0.99, centroids=cents
    ).collect()
    m = np.floor(vecs.astype(np.float64) * _MICRO).astype(np.int64)
    cm = np.floor(cents * _MICRO).astype(np.int64)
    want = (m @ cm.T).argmax(axis=1)
    assert {r["vec_id"]: r["cluster_id"] for r in rows} == {
        i: int(want[i]) for i in range(12)
    }


def test_fitted_kmeans_tier(spark):
    """fit="sampled_kmeans" sources centroids from the deterministic
    IVF Lloyd's fit: output equals passing index.centroids explicitly
    (same plan, only the matrix differs), cluster ids are 0-based fit
    indices, and the planted near-identical pair still resolves
    lower-id-wins when co-located."""
    from nlp_to_nosql_spark.operators.ivf import IVFIndex

    rng = np.random.RandomState(5)
    vecs = rng.randn(30, DIM).astype(np.float32)
    vecs[21] = vecs[4] * 1.5  # cosine exactly 1, same cell guaranteed
    df = _df(spark, vecs)

    index = IVFIndex(n_lists=3)
    index.fit(df, id_col="vec_id", vec_col="embedding")
    want = {
        (r["vec_id"], r["cluster_id"], r["kept"])
        for r in semantic_dedup(
            df, n_clusters=3, threshold=0.9, centroids=index.centroids
        ).collect()
    }
    got_rows = semantic_dedup(
        df, n_clusters=3, threshold=0.9, fit="sampled_kmeans"
    ).collect()
    got = {(r["vec_id"], r["cluster_id"], r["kept"]) for r in got_rows}
    assert got == want
    by_id = {r["vec_id"]: r for r in got_rows}
    assert 0 <= by_id[4]["cluster_id"] < 3
    assert by_id[4]["cluster_id"] == by_id[21]["cluster_id"]
    assert by_id[4]["kept"] is True and by_id[21]["kept"] is False

    with pytest.raises(ValueError, match="not both"):
        semantic_dedup(
            df, n_clusters=3, fit="sampled_kmeans", centroids=index.centroids
        )
    with pytest.raises(ValueError, match="unknown fit"):
        semantic_dedup(df, n_clusters=3, fit="full_kmeans")


def test_offset_gapped_ids_label_by_centroid_id(spark):
    # ids 100, 103, 106, …: the contract centroids are the n LOWEST-id
    # vectors (not "id < n", which matches nothing here) and cluster_id
    # is the actual centroid row id, exactly as the DuckDB twin labels it
    rng = np.random.RandomState(7)
    vecs = rng.randn(10, DIM).astype(np.float32)
    ids = [100 + 3 * i for i in range(10)]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(ids[i], [float(x) for x in vecs[i]]) for i in range(10)], schema
    )
    rows = semantic_dedup(df, n_clusters=3, threshold=0.99).collect()
    want_idx = _numpy_assign(vecs, 3)  # rows are already id-ordered
    want = {ids[i]: ids[int(want_idx[i])] for i in range(10)}
    assert {r["vec_id"]: r["cluster_id"] for r in rows} == want


def test_undersized_input_raises(spark):
    rng = np.random.RandomState(2)
    df = _df(spark, rng.randn(3, DIM).astype(np.float32))
    with pytest.raises(ValueError, match="centroid rows"):
        semantic_dedup(df, n_clusters=8)


def _skewed_fixture(spark, n=200):
    """~half the corpus lands in ONE cell of two explicit axis centroids."""
    rng = np.random.RandomState(5)
    vecs = rng.randn(n, DIM).astype(np.float32) * 0.05
    half = n // 2
    vecs[:half, 0] += 3.0  # cell 0 absorbs half the corpus
    vecs[half:, 1] += np.linspace(1.0, 4.0, n - half).astype(np.float32)
    cents = np.eye(2, DIM)
    return _df(spark, vecs), cents


def test_skewed_cell_sub_blocking_equal_results(spark):
    # cell_block_size must change ONLY the partitioning, never the answer
    df, cents = _skewed_fixture(spark)
    small = semantic_dedup(
        df, threshold=0.8, centroids=cents, cell_block_size=16
    ).collect()
    huge = semantic_dedup(
        df, threshold=0.8, centroids=cents, cell_block_size=1_000_000_000
    ).collect()
    key = lambda r: r["vec_id"]
    assert sorted(small, key=key) == sorted(huge, key=key)
    # the fixture really is skewed AND really has dups to prune
    assert sum(not r["kept"] for r in small) > 0


def test_skewed_cell_groups_are_bounded(spark):
    # the replicated frame's groups — what one applyInPandas task
    # materializes — stay O(cell_block_size) no matter how skewed a cell
    from nlp_to_nosql_spark.operators.semdedup import _sub_blocked

    df, _ = _skewed_fixture(spark)
    cbs = 16
    assigned = df.withColumn(
        "cluster_id",
        (F.col("vec_id") < 100).cast("long"),  # one cell holds half of 200
    )
    sizes = (
        _sub_blocked(assigned, "vec_id", "embedding", cbs)
        .groupBy("cluster_id", "_pa", "_pb")
        .count()
        .collect()
    )
    by_cell = {}
    for r in sizes:
        by_cell.setdefault(r["cluster_id"], []).append(r["count"])
    # every cell split into >1 group (both cells hold 100 > 16 rows) …
    assert all(len(v) > 1 for v in by_cell.values())
    # … and no group exceeds a small hash-imbalance factor of 2·cbs
    assert max(r["count"] for r in sizes) <= 4 * cbs


def test_ragged_embedding_raises(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(0, [1.0] * DIM), (1, [1.0] * (DIM - 1)), (2, [0.5] * DIM)], schema
    )
    cents = np.eye(2, DIM)
    with pytest.raises(Exception, match="ragged"):
        semantic_dedup(df, threshold=0.9, centroids=cents).collect()


def test_empty_input_raises(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    with pytest.raises(ValueError, match="no centroid rows"):
        semantic_dedup(spark.createDataFrame([], schema), n_clusters=4)


# ---------------------------------------------------------------------------
# micro-kmeans fitted tier (round 10)
# ---------------------------------------------------------------------------

def _md5_h28(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _numpy_micro_kmeans(vecs, n_clusters, iters, seed, mod, keep):
    """Pure-python/numpy replica of micro_kmeans_fit + final L2 assign."""
    m = np.floor(vecs.astype(np.float64) * _MICRO).astype(np.int64)
    train_ids = [
        i
        for i in range(len(vecs))
        if _md5_h28(f"kmfit{seed}:{i}") % mod < keep
    ]
    order = sorted(train_ids, key=lambda i: (_md5_h28(f"kminit{seed}:{i}"), i))
    cents = m[order[:n_clusters]].copy()
    tr = m[train_ids]
    for _ in range(iters):
        d = (
            (tr * tr).sum(axis=1, keepdims=True)
            - 2 * (tr @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
        a = d.argmin(axis=1)
        nxt = cents.copy()
        for c in range(n_clusters):
            rows = tr[a == c]
            if len(rows):
                nxt[c] = np.floor_divide(rows.sum(axis=0), len(rows))
        if np.array_equal(nxt, cents):
            break
        cents = nxt
    d = (
        (m * m).sum(axis=1, keepdims=True)
        - 2 * (m @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    return cents, d.argmin(axis=1)


def test_micro_kmeans_fit_matches_numpy_model(planted):
    from nlp_to_nosql_spark.operators.semdedup import micro_kmeans_fit

    vecs, df = planted
    got = micro_kmeans_fit(
        df, n_clusters=3, iters=2, seed=7, sample_mod=4, sample_keep=2
    )
    want, _ = _numpy_micro_kmeans(vecs, 3, 2, 7, 4, 2)
    assert np.array_equal(got, want)


def test_fitted_tier_assignment_and_keepdrop(planted):
    """fit='micro_kmeans' labels by 0-based centroid index under exact
    int64 L2 argmin, and keep/drop stays lower-id-wins within cells."""
    vecs, df = planted
    rows = semantic_dedup(
        df, n_clusters=3, threshold=0.99, fit="micro_kmeans",
        fit_iters=2, fit_seed=7,
    ).collect()
    _, want_assign = _numpy_micro_kmeans(vecs, 3, 2, 7, 4, 2)
    got = {r["vec_id"]: r["cluster_id"] for r in rows}
    assert got == {i: int(want_assign[i]) for i in range(len(vecs))}
    kept = {r["vec_id"]: r["kept"] for r in rows}
    assert kept[0] is True
    # vec 17 = 2.5 * vec 0 (cosine exactly 1): dropped iff same cell
    if want_assign[17] == want_assign[0]:
        assert kept[17] is False


def test_fitted_semdedup_matches_duckdb_twin(planted):
    import duckdb
    import pandas as pd

    from nlp_to_nosql_spark.operators.semdedup import (
        semantic_dedup_fitted_sql,
    )

    vecs, df = planted
    got = sorted(
        tuple(r)
        for r in semantic_dedup(
            df, n_clusters=3, threshold=0.99, fit="micro_kmeans",
            fit_iters=2, fit_seed=7,
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [list(map(float, v)) for v in vecs],
            }
        ),
    )
    want = con.execute(
        semantic_dedup_fitted_sql(
            n_clusters=3, iters=2, threshold=0.99, seed=7, dim=DIM
        )
    ).fetchall()
    assert got == sorted(tuple(r) for r in want)


def test_micro_kmeans_undersized_sample_raises(spark):
    from nlp_to_nosql_spark.operators.semdedup import micro_kmeans_fit

    df = _df(spark, np.eye(3, DIM, dtype=np.float32))
    with pytest.raises(ValueError, match="training sample"):
        micro_kmeans_fit(df, n_clusters=8)


def test_micro_kmeans_iters_validated(spark):
    from nlp_to_nosql_spark.operators.semdedup import micro_kmeans_fit

    df = _df(spark, np.eye(3, DIM, dtype=np.float32))
    with pytest.raises(ValueError, match="iters"):
        micro_kmeans_fit(df, n_clusters=2, iters=0)


# ---------------------------------------------------------------------------
# incremental ingest tier (dedup16)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ingest_fixture(spark):
    """Corpus ids 0..59, batch ids 60..99 (ingestion order), with
    near-dup structure planted both corpus->batch and batch->batch —
    including a batch row whose ONLY near-dup is a DROPPED corpus row
    (the case where compare_to='kept' and 'all' legitimately differ)."""
    rng = np.random.RandomState(23)
    vecs = rng.randn(100, DIM).astype(np.float32)
    # a geometric CHAIN at threshold 0.9: u ─0.94─ 30 ─0.94─ 71 with
    # cos(u, 71) = 0.94² ≈ 0.88 < 0.9.  Corpus: 7 = u keeps, 30 drops
    # (cos 0.94 vs 7).  Batch row 71 then near-dups ONLY the dropped
    # corpus row — compare_to='all' drops it, 'kept' keeps it.
    u = vecs[7] / np.linalg.norm(vecs[7])
    # two unit directions orthogonal to u and to each other (Gram-Schmidt)
    r1, r2 = rng.randn(DIM), rng.randn(DIM)
    w1 = r1 - (r1 @ u) * u
    w1 /= np.linalg.norm(w1)
    w2 = r2 - (r2 @ u) * u - (r2 @ w1) * w1
    w2 /= np.linalg.norm(w2)
    c, s = 0.94, np.sqrt(1 - 0.94**2)
    v30 = c * u + s * w1
    vecs[7] = u.astype(np.float32)
    vecs[30] = v30.astype(np.float32)                    # corpus dup of 7
    vecs[71] = (c * v30 + s * w2).astype(np.float32)     # cos=.94 to 30, .88 to 7
    vecs[70] = vecs[7] * 1.8                             # batch ~ kept corpus rep
    vecs[80] = vecs[65] + rng.randn(DIM).astype(np.float32) * 0.004  # batch-batch pair
    df = _df(spark, vecs)
    corpus = df.filter(F.col("vec_id") < 60)
    batch = df.filter(F.col("vec_id") >= 60)
    return corpus, batch


def test_semdedup_incremental_equals_full_rerun(ingest_fixture):
    """The theorem the tier is built on: with compare_to='all' and
    corpus ids below batch ids, incremental admission under the SAME
    frozen centroids equals the full chain rerun restricted to the
    batch — and the corpus state is never recomputed."""
    from nlp_to_nosql_spark.operators.semdedup import (
        micro_kmeans_fit,
        semantic_dedup,
        semantic_dedup_incremental,
    )

    corpus, batch = ingest_fixture
    cents = micro_kmeans_fit(corpus, 4, iters=2, seed=7)
    prior = semantic_dedup(corpus, threshold=0.9, centroids_micro=cents)
    state = prior.join(corpus.select("vec_id", "embedding"), "vec_id")
    inc = {
        r["vec_id"]: (r["cluster_id"], r["kept"])
        for r in semantic_dedup_incremental(
            batch, state, cents, threshold=0.9, compare_to="all"
        ).collect()
    }
    full = {
        r["vec_id"]: (r["cluster_id"], r["kept"])
        for r in semantic_dedup(
            corpus.unionByName(batch),
            threshold=0.9,
            centroids_micro=cents,
        ).collect()
        if r["vec_id"] >= 60
    }
    assert inc == full
    assert not all(v[1] for v in inc.values())  # something was dropped


def test_semdedup_incremental_kept_mode_is_superset(ingest_fixture):
    """compare_to='kept' (production: dropped vectors are gone) keeps a
    superset of the 'all' keep-set, and the fixture exercises a real
    divergence: a batch row whose only near-dup is a dropped corpus
    row survives under 'kept'."""
    from nlp_to_nosql_spark.operators.semdedup import (
        micro_kmeans_fit,
        semantic_dedup,
        semantic_dedup_incremental,
    )

    corpus, batch = ingest_fixture
    cents = micro_kmeans_fit(corpus, 4, iters=2, seed=7)
    prior = semantic_dedup(corpus, threshold=0.9, centroids_micro=cents)
    state = prior.join(corpus.select("vec_id", "embedding"), "vec_id")

    def keeps(mode):
        return {
            r["vec_id"]
            for r in semantic_dedup_incremental(
                batch, state, cents, threshold=0.9, compare_to=mode
            ).collect()
            if r["kept"]
        }

    k_all, k_kept = keeps("all"), keeps("kept")
    assert k_all <= k_kept
    # the planted chain fires: 71's only near-dup is the dropped 30
    assert 71 in k_kept and 71 not in k_all


def test_semdedup_incremental_validates_inputs(ingest_fixture):
    from nlp_to_nosql_spark.operators.semdedup import (
        micro_kmeans_fit,
        semantic_dedup_incremental,
    )

    corpus, batch = ingest_fixture
    cents = micro_kmeans_fit(corpus, 4, iters=2, seed=7)
    with pytest.raises(ValueError, match="compare_to"):
        semantic_dedup_incremental(
            batch, corpus, cents, compare_to="bogus"
        )
    with pytest.raises(ValueError, match="corpus_state lacks"):
        semantic_dedup_incremental(batch, corpus, cents)  # no kept col


def test_semantic_dedup_centroids_micro_matches_fit_path(planted):
    """Passing micro_kmeans_fit's matrix via centroids_micro= must equal
    fit='micro_kmeans' with the same config (the hand-off contract the
    incremental tier relies on)."""
    from nlp_to_nosql_spark.operators.semdedup import (
        micro_kmeans_fit,
        semantic_dedup,
    )

    _, df = planted
    cents = micro_kmeans_fit(df, 4, iters=2, seed=7)
    via_param = sorted(
        tuple(r)
        for r in semantic_dedup(
            df, threshold=0.4, centroids_micro=cents
        ).collect()
    )
    via_fit = sorted(
        tuple(r)
        for r in semantic_dedup(
            df, n_clusters=4, threshold=0.4, fit="micro_kmeans",
            fit_iters=2, fit_seed=7,
        ).collect()
    )
    assert via_param == via_fit
    with pytest.raises(ValueError, match="exclusive"):
        semantic_dedup(df, centroids_micro=cents, fit="micro_kmeans")


def test_semantic_dedup_fitted_auto_matches_duckdb_twin(spark):
    """The bounded-cell auto contract generalized to the SemDeDup tier:
    n_clusters='auto' resolves max(8, ceil(count/target)) inside
    micro_kmeans_fit, and the twin's scalar-subquery LIMIT derives the
    identical count — 40 vectors at target_cell_rows=4 resolve to 10
    cells (> the floor) on both engines."""
    import duckdb
    import random

    from nlp_to_nosql_spark.operators.semdedup import (
        semantic_dedup,
        semantic_dedup_fitted_sql,
    )
    from nlp_to_nosql_spark.operators.similarity import resolve_n_cells

    rng = random.Random(23)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert resolve_n_cells("auto", 40, target_cell_rows=4) == 10
    got = sorted(
        tuple(r)
        for r in semantic_dedup(
            df, n_clusters="auto", target_cell_rows=4, threshold=0.2,
            fit="micro_kmeans",
        ).collect()
    )
    con = duckdb.connect()
    con.register("emb_t", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            semantic_dedup_fitted_sql(
                n_clusters="auto", target_cell_rows=4, threshold=0.2,
                dim=8, table="emb_t",
            )
        ).fetchall()
    )
    assert got == want and len(got) == 40
    assert max(r[1] for r in got) >= 8  # auto grew past the floor


def test_semantic_dedup_auto_requires_fitted_tier(spark):
    """'auto' is a fitted-tier contract: the lowest-id contract config
    and IVFIndex's n_lists take explicit ints."""
    from nlp_to_nosql_spark.operators.semdedup import semantic_dedup

    df = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="auto"):
        semantic_dedup(df, n_clusters="auto")
