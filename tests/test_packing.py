"""Token-budget packing: distributed prefix sum must equal the global
cumsum regardless of partitioning; batch rule pinned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nlp_to_nosql_spark.operators.packing import batch_manifest, pack_by_token_budget


@pytest.fixture(scope="module")
def docs(spark):
    # token counts 10,20,...,100 over ids 1..10 → total 550
    return spark.createDataFrame(
        [(i, i * 10) for i in range(1, 11)], "doc_id long, n_tokens long"
    )


def _rows(df):
    return sorted(
        (r["doc_id"], r["cum_tokens"], r["batch_id"]) for r in df.collect()
    )


def test_global_cumsum_matches_single_partition_truth(spark, docs):
    want = [
        (i, sum(j * 10 for j in range(1, i + 1)), (sum(j * 10 for j in range(1, i)) // 100))
        for i in range(1, 11)
    ]
    got = _rows(pack_by_token_budget(docs, "doc_id", "n_tokens", budget=100))
    assert got == want


@pytest.mark.parametrize("parts", [1, 3, 7, 16])
def test_partition_count_independence(spark, docs, parts):
    base = _rows(pack_by_token_budget(docs, "doc_id", "n_tokens", budget=100))
    got = _rows(
        pack_by_token_budget(docs, "doc_id", "n_tokens", budget=100, partitions=parts)
    )
    assert got == base


def test_straddling_doc_goes_to_earlier_batch(spark):
    # doc 2 starts at cum_exclusive=90 (< 100) but ends at 190: batch 0
    docs = spark.createDataFrame(
        [(1, 90), (2, 100), (3, 10)], "doc_id long, n_tokens long"
    )
    got = {r["doc_id"]: r["batch_id"] for r in
           pack_by_token_budget(docs, "doc_id", "n_tokens", budget=100).collect()}
    assert got == {1: 0, 2: 0, 3: 1}


def test_manifest(spark, docs):
    packed = pack_by_token_budget(docs, "doc_id", "n_tokens", budget=100)
    m = {r["batch_id"]: (r["n_docs"], r["n_tokens"], r["first_id"], r["last_id"])
         for r in batch_manifest(packed, "doc_id", "n_tokens").collect()}
    total_docs = sum(v[0] for v in m.values())
    total_tokens = sum(v[1] for v in m.values())
    assert total_docs == 10 and total_tokens == 550
    # batches are contiguous id ranges
    spans = sorted((v[2], v[3]) for v in m.values())
    for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
        assert b1 < a2


def test_budget_validation(spark, docs):
    with pytest.raises(ValueError, match="budget"):
        pack_by_token_budget(docs, "doc_id", "n_tokens", budget=0)
