"""Salted join: result equivalence with a plain join, skew spreading."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from nlp_to_nosql_spark.operators.joins import salted_join

LEFT = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
)
RIGHT = T.StructType(
    [T.StructField("rk", T.LongType()), T.StructField("name", T.StringType())]
)


@pytest.fixture(scope="module")
def frames(spark):
    # heavy skew: 90% of left rows share key 7
    left = spark.createDataFrame(
        [(7, i) for i in range(900)] + [(i % 5, i) for i in range(100)], LEFT
    )
    right = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(10)], RIGHT
    )
    return left, right


def _norm(df):
    return sorted((r["k"], r["v"], r["name"]) for r in df.collect())


def test_salted_equals_plain_join(frames):
    left, right = frames
    plain = left.join(right, left["k"] == right["rk"]).select("k", "v", "name")
    salted = salted_join(left, right, "k", "rk", salt=8)
    assert _norm(salted) == _norm(plain)


def test_salt_spreads_hot_key(frames):
    left, _ = frames
    salts = (
        left.withColumn("_salt", (F.rand(42) * 8).cast("int"))
        .filter(F.col("k") == 7)
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts >= 6  # the hot key lands in most of the 8 sub-partitions


def test_salted_left_join_keeps_unmatched(spark, frames):
    left, right = frames
    with_orphan = left.union(
        spark.createDataFrame([(99, 1)], LEFT)
    )
    out = salted_join(with_orphan, right, "k", "rk", salt=4, how="left")
    assert out.filter(F.col("k") == 99).count() == 1
    assert out.filter(F.col("k") == 99).first()["name"] is None


def test_runtime_bloom_filter_injects_on_selective_shuffle_join(spark):
    """Runtime bloom-filter semi-join reduction — the scan-volume lever
    for selective shuffle joins at cluster scale (on by default; the
    application side must exceed a 10 GB scan threshold that local
    testdata never reaches, so the test lowers it).  Spark should push a
    might_contain(bloom(o_orderkey)) predicate into the fact-side scan
    when the dimension side carries a selective filter."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # Injection keys off scan-size statistics, so the application
        # side must be a file source, not an in-memory relation.
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").filter(
            F.col("o_totalprice") < 2000
        )
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        # and the reduced join still computes the right answer
        want = (
            li.join(orders.hint("broadcast"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .count()
            .collect()
        )
        assert sorted((r[0], r[1]) for r in j.collect()) == sorted(
            (r[0], r[1]) for r in want
        )
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_salted_rejects_right_preserving_joins(frames):
    left, right = frames
    import pytest as _pytest
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with _pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(left, right, "k", "rk", salt=4, how=how)


def test_salted_semi_and_anti(spark):
    from nlp_to_nosql_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k long, lv string")
    right = spark.createDataFrame([(1, "r1"), (2, "r2")], "rk long, rv string")
    semi = salted_join(left, right, "k", "rk", salt=4, how="left_semi")
    assert semi.columns == ["k", "lv"]
    assert sorted(r["k"] for r in semi.collect()) == [1, 2]
    anti = salted_join(left, right, "k", "rk", salt=4, how="left_anti")
    assert sorted(r["k"] for r in anti.collect()) == [3]


def test_salt_is_deterministic_row_hash(spark):
    """Same input → same salt on recomputation (rand() could re-draw under
    task retry, losing or duplicating matches)."""
    from pyspark.sql import functions as F

    from nlp_to_nosql_spark.operators.joins import salted_join

    left = spark.range(500).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    right = spark.range(500).select(F.col("id").alias("rk"), F.lit("r").alias("rv"))
    out = salted_join(left, right, "k", "rk", salt=8)
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in out.collect())
    assert a == b and len(a) == 500


def test_salted_join_survives_user_salt_column(spark):
    from nlp_to_nosql_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1, "keepme")], "k long, _salt string")
    right = spark.createDataFrame([(1, 9.0)], "rk long, rv double")
    out = salted_join(left, right, "k", "rk", salt=4).collect()
    assert out[0]["_salt"] == "keepme"  # user column NOT overwritten


def test_salted_join_tolerates_map_column(spark):
    """Hash expressions reject MapType — a left side carrying a map column
    must still salt (off the other columns), not raise at plan time."""
    left = spark.createDataFrame(
        [(7, i, {"a": i}) for i in range(50)],
        "k long, v long, meta map<string,long>",
    )
    right = spark.createDataFrame([(7, "dim7")], "rk long, name string")
    out = salted_join(left, right, "k", "rk", salt=4).collect()
    assert len(out) == 50 and all(r["name"] == "dim7" for r in out)


def test_salt_hash_cols_excludes_only_maps():
    """Every hashable column participates (dropping one risks hashing
    only hot-key constants and collapsing the salt); maps never do."""
    from pyspark.sql import types as T

    from nlp_to_nosql_spark.operators.joins import _salt_hash_cols

    class _FakeDF:
        schema = T.StructType(
            [
                T.StructField("text", T.StringType()),
                T.StructField("k", T.LongType()),
                T.StructField("meta", T.MapType(T.StringType(), T.LongType())),
                T.StructField("n1", T.IntegerType()),
                T.StructField("n2", T.DoubleType()),
            ]
        )

    cols = _salt_hash_cols(_FakeDF(), "k")
    assert cols == ["k", "text", "n1", "n2"]


def test_salt_spreads_when_only_text_varies(spark):
    """The review scenario: every non-key scalar is constant under the hot
    key and only a string column varies — the salt must still spread."""
    from pyspark.sql import functions as F

    from nlp_to_nosql_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(7, 1, f"doc-{i}") for i in range(400)],
        "k long, flag int, doc_id string",
    )
    right = spark.createDataFrame([(7, "dim7")], "rk long, name string")
    out = salted_join(left, right, "k", "rk", salt=8)
    assert out.count() == 400
    # distinct salts actually used by the hot key (re-derive the expr)
    from nlp_to_nosql_spark.operators.joins import _salt_hash_cols

    n_salts = (
        left.withColumn(
            "_s",
            F.pmod(
                F.xxhash64(F.lit(42), *[F.col(c) for c in _salt_hash_cols(left, "k")]),
                F.lit(8),
            ),
        )
        .select("_s")
        .distinct()
        .count()
    )
    assert n_salts >= 6
