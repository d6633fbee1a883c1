"""Connected-components / dedup-cluster tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nlp_to_nosql_spark.operators.graph import connected_components, dedup_clusters


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def test_chain_collapses_to_min(spark):
    # 0-1-2-3-4-5 chain: multi-hop propagation (exercises pointer jumping)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "a long, b long"
    )
    got = _labels(connected_components(edges, "a", "b"))
    assert got == {i: 0 for i in range(6)}


def test_two_components_and_direction_invariance(spark):
    # {1,2,3} via (3,2),(2,1) reversed order; {10,11}; edge direction mixed
    edges = spark.createDataFrame(
        [(3, 2), (1, 2), (11, 10)], "a long, b long"
    )
    got = _labels(connected_components(edges, "a", "b"))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_isolated_nodes_are_singletons(spark):
    edges = spark.createDataFrame([(1, 2)], "a long, b long")
    nodes = spark.createDataFrame([(n,) for n in (1, 2, 7, 9)], "doc_id long")
    got = _labels(connected_components(edges, "a", "b", nodes=nodes, id_col="doc_id"))
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}


def test_self_loop_and_duplicate_edges(spark):
    edges = spark.createDataFrame(
        [(4, 4), (4, 5), (5, 4), (4, 5)], "a long, b long"
    )
    got = _labels(connected_components(edges, "a", "b"))
    assert got == {4: 4, 5: 4}


def test_dedup_clusters_representative_policy(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(5, 3), (3, 1)], "id_a long, id_b long"
    )
    out = dedup_clusters(pairs, docs)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1}
    # keep-one filter retains exactly one doc per cluster
    keep = out.filter(F.col("cluster_id") == F.col("doc_id"))
    assert keep.count() == 4


def test_no_convergence_raises(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(40)], "a long, b long")
    with pytest.raises(RuntimeError):
        connected_components(edges, "a", "b", max_iter=1)
