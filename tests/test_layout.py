"""Z-order layout tests (operators/layout.py)."""

import pytest
from pyspark.sql import functions as F

from nlp_to_nosql_spark.operators.layout import (
    zorder_key,
    zorder_profile,
    zorder_repartition,
    zorder_sql_expr,
)


def _morton2(x, y, bits):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    return spark.createDataFrame(rows, "x long, y long")


def test_zorder_key_matches_reference_morton(grid):
    out = grid.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=4).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _morton2(r["x"], r["y"], 4), (r["x"], r["y"])


def test_zorder_key_masks_high_bits(spark):
    df = spark.createDataFrame([(16 + 3, 2)], "x long, y long")
    z = df.select(zorder_key([F.col("x"), F.col("y")], bits=4)).first()[0]
    assert z == _morton2(3, 2, 4)  # x masked to 4 bits


def test_zorder_key_null_dimension_is_null(spark):
    df = spark.createDataFrame([(None, 2)], "x long, y long")
    assert df.select(zorder_key([F.col("x"), F.col("y")], 4)).first()[0] is None


def test_zorder_key_rejects_overflow():
    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b")], bits=32)


def test_sql_expr_matches_spark(grid):
    import duckdb

    pdf = grid.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    expr = zorder_sql_expr(["x", "y"], bits=4)
    duck = dict(con.execute(f"SELECT x * 16 + y, {expr} FROM t").fetchall())
    got = {
        r["k"]: r["z"]
        for r in grid.select(
            (F.col("x") * 16 + F.col("y")).alias("k"),
            zorder_key([F.col("x"), F.col("y")], 4).alias("z"),
        ).collect()
    }
    assert duck == got


def test_profile_buckets_are_rectangles(grid):
    # 4 dims' worth of bits -> 2^2 buckets of the 4-bit curve: each Z
    # bucket of a FULL grid is an axis-aligned quadrant.
    prof = zorder_profile(grid, ["x", "y"], bits=4, bucket_bits=2)
    rows = {r["zbucket"]: r for r in prof.collect()}
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        assert r["n_rows"] == 64
        assert r["max_x"] - r["min_x"] == 7  # 8x8 quadrant
        assert r["max_y"] - r["min_y"] == 7


def test_repartition_ranges_disjoint(grid):
    out = zorder_repartition(grid, ["x", "y"], num_partitions=4, bits=4)
    assert "_zkey" not in out.columns
    parts = (
        out.withColumn(
            "z", zorder_key([F.col("x"), F.col("y")], 4)
        )
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in parts)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # range partitions do not overlap in z
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


def _disc_quantile(values, pct):
    # smallest v whose at-or-below count reaches pct% of len(values)
    vals = sorted(values)
    n = len(vals)
    for i, v in enumerate(vals, start=1):
        if i * 100 >= pct * n:
            return v
    return vals[-1]


def test_exact_quantiles_matches_reference_global_and_grouped(spark):
    from nlp_to_nosql_spark.operators.layout import exact_quantiles

    a = [5, 1, 1, 9, 3, 3, 3, 40, -2, 7, 7, 0]
    b = [100, 2, 2, 2, 50]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "grp string, v long")

    got = {
        (r["grp"], r["pct"]): r["value"]
        for r in exact_quantiles(
            df, "v", (1, 25, 50, 75, 100), group_col="grp"
        ).collect()
    }
    for grp, vals in (("a", a), ("b", b)):
        for pct in (1, 25, 50, 75, 100):
            assert got[(grp, pct)] == _disc_quantile(vals, pct), (grp, pct)

    both = a + b
    got_g = {
        r["pct"]: r["value"]
        for r in exact_quantiles(df, "v", (50, 90)).collect()
    }
    assert got_g == {50: _disc_quantile(both, 50), 90: _disc_quantile(both, 90)}


def test_exact_quantiles_ignores_nulls_and_validates(spark):
    import pytest as _pytest

    from nlp_to_nosql_spark.operators.layout import exact_quantiles

    df = spark.createDataFrame(
        [(1,), (None,), (3,), (None,)], "v long"
    )
    got = {r["pct"]: r["value"] for r in exact_quantiles(df, "v", (50, 100)).collect()}
    assert got == {50: 1, 100: 3}
    with _pytest.raises(ValueError):
        exact_quantiles(df, "v", (0, 50))
    with _pytest.raises(ValueError):
        exact_quantiles(df, "v", ())


def test_exact_quantiles_plan_shape(spark):
    from nlp_to_nosql_spark.operators.layout import exact_quantiles

    df = spark.createDataFrame(
        [(i % 3, i % 17) for i in range(200)], "grp int, v long"
    )
    out = exact_quantiles(df, "v", (50, 90), group_col="grp")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # histogram agg + group-partitioned window: two bounded exchanges,
    # and the window partitions by the group (never a single-partition
    # global sort)
    assert plan.count("Exchange") == 2, plan
    assert "windowspecdefinition(grp" in plan, plan
