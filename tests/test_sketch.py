"""Sketch operators: HLL register table + count-min heavy hitters.

Covers the three properties that make the sketches trustworthy at
scale: integer-exact rho math, shard mergeability (the incremental
story), and the accuracy/overestimate contracts the docstrings claim.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nlp_to_nosql_spark.operators.sketch import (
    cms_heavy_hitters,
    hll_estimate,
    hll_registers,
    tokens_of,
)


def _vocab_df(spark, n, prefix="tok"):
    """One single-token document per distinct token: NDV == n exactly."""
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("text")
    )


def _py_rho(v: int, max_rho: int) -> int:
    if v == 0:
        return max_rho
    return (v & -v).bit_length()


class TestHLL:
    def test_rho_matches_python_bit_math(self, spark):
        # drive _rho_col through hll_registers on crafted single tokens
        # whose md5-derived (reg, rho) we recompute in pure python
        import hashlib

        df = _vocab_df(spark, 300)
        got = {
            r["reg"]: r["max_rho"]
            for r in hll_registers(df, "text", m=64).collect()
        }
        regs: dict[int, int] = {}
        for i in range(300):
            h = int(hashlib.md5(f"tok{i}".encode()).hexdigest()[:15], 16)
            reg, v = h % 64, h >> 6
            regs[reg] = max(regs.get(reg, 0), _py_rho(v, 55))
        assert got == regs

    def test_estimate_within_hll_error_bound(self, spark):
        # m=64 -> relative standard error ~1.04/sqrt(64) = 13%; allow 3x
        n = 5000
        regs = [
            (r["reg"], r["max_rho"])
            for r in hll_registers(_vocab_df(spark, n), "text").collect()
        ]
        est = hll_estimate(regs, m=64)
        assert abs(est - n) / n < 0.4

    def test_estimate_precision_improves_with_m(self, spark):
        # standard error is ±1.04/√m: m=64 → ~13 %, m=1024 → ~3.3 %.
        # Assert each within ~3σ of its own bound, so users can size m
        # to their NDV tolerance (documented in PERFORMANCE.md).
        n = 20_000
        df = _vocab_df(spark, n)
        for m, bound in ((64, 0.40), (1024, 0.10)):
            regs = [
                (r["reg"], r["max_rho"])
                for r in hll_registers(df, "text", m=m).collect()
            ]
            est = hll_estimate(regs, m=m)
            assert abs(est - n) / n < bound, (m, est)

    def test_registers_of_is_the_tokenized_core(self, spark):
        # hll_registers == hll_registers_of ∘ tokens_of, register-exact —
        # pins the column-general core the Bloom auto-sizing uses
        from nlp_to_nosql_spark.operators.sketch import hll_registers_of

        df = spark.createDataFrame(
            [("alpha beta gamma",), ("beta  DELTA",), ("epsilon",)],
            "text string",
        )
        a = {
            r["reg"]: r["max_rho"]
            for r in hll_registers(df, "text", m=64).collect()
        }
        b = {
            r["reg"]: r["max_rho"]
            for r in hll_registers_of(tokens_of(df, "text"), "tok", m=64).collect()
        }
        assert a == b

    def test_registers_merge_across_shards(self, spark):
        # sketch(A union B) == element-wise max(sketch(A), sketch(B))
        a = _vocab_df(spark, 400, prefix="a")
        b = _vocab_df(spark, 400, prefix="b")
        whole = {
            r["reg"]: r["max_rho"]
            for r in hll_registers(a.unionByName(b), "text").collect()
        }
        ra = {r["reg"]: r["max_rho"] for r in hll_registers(a).collect()}
        rb = {r["reg"]: r["max_rho"] for r in hll_registers(b).collect()}
        merged = {
            k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
        }
        assert whole == merged

    def test_estimate_exact_in_linear_counting_regime(self, spark):
        # tiny NDV -> linear-counting branch; should land very close
        n = 30
        regs = [
            (r["reg"], r["max_rho"])
            for r in hll_registers(_vocab_df(spark, n), "text").collect()
        ]
        est = hll_estimate(regs, m=64)
        assert abs(est - n) / n < 0.25

    def test_m_must_be_power_of_two(self, spark):
        with pytest.raises(ValueError):
            hll_registers(_vocab_df(spark, 5), "text", m=48)


class TestCMS:
    @pytest.fixture(scope="class")
    def skewed(self, spark):
        # "hot" appears 500x, "warm" 50x, 200 singletons
        rows = (
            [("hot hot",)] * 250
            + [("warm",)] * 50
            + [(f"cold{i}",) for i in range(200)]
        )
        return spark.createDataFrame(rows, ["text"])

    def test_estimates_never_undercount(self, spark, skewed):
        out = cms_heavy_hitters(skewed, "text", top_n=10).collect()
        assert out, "expected heavy hitters"
        for r in out:
            assert r["est_cnt"] >= r["true_cnt"], r

    def test_top_tokens_and_exact_counts(self, spark, skewed):
        out = {
            r["tok"]: (r["true_cnt"], r["est_cnt"])
            for r in cms_heavy_hitters(skewed, "text", top_n=2).collect()
        }
        assert set(out) == {"hot", "warm"}
        assert out["hot"][0] == 500
        assert out["warm"][0] == 50
        # width=1024 over ~202 distinct tokens: the hot key's 4 cells are
        # overwhelmingly collision-free; min-over-rows must then be exact
        assert out["hot"][1] >= 500

    def test_narrow_width_overestimates(self, spark, skewed):
        # width=2 forces collisions: estimates inflate but never drop
        out = cms_heavy_hitters(skewed, "text", width=2, top_n=5).collect()
        assert all(r["est_cnt"] >= r["true_cnt"] for r in out)
        assert any(r["est_cnt"] > r["true_cnt"] for r in out)

    def test_tokens_of_drops_empties_and_normalizes(self, spark):
        df = spark.createDataFrame([("  Foo   BAR  ",), ("",)], ["text"])
        toks = [r["tok"] for r in tokens_of(df).collect()]
        assert sorted(toks) == ["bar", "foo"]


class TestGroupedHLL:
    def _keyed_vocab(self, spark, sizes: dict):
        """One single-token doc per (key, distinct token)."""
        parts = None
        for key, n in sizes.items():
            df = spark.range(n).selectExpr(
                f"'{key}' AS k",
                f"concat('{key}:tok', CAST(id AS STRING)) AS tok",
            )
            parts = df if parts is None else parts.unionByName(df)
        return parts

    def test_grouped_registers_match_per_key_global(self, spark):
        from nlp_to_nosql_spark.operators.sketch import (
            hll_registers_by,
            hll_registers_of,
        )

        vals = self._keyed_vocab(spark, {"a": 300, "b": 40})
        grouped = hll_registers_by(vals, ["k"], "tok", m=64).collect()
        for key in ("a", "b"):
            got = {
                (r["reg"], r["max_rho"]) for r in grouped if r["k"] == key
            }
            want = {
                (r["reg"], r["max_rho"])
                for r in hll_registers_of(
                    vals.filter(F.col("k") == key), "tok", m=64
                ).collect()
            }
            assert got == want, key

    def test_ndv_by_equals_driver_side_estimator(self, spark):
        # the in-plan estimator must reproduce hll_estimate exactly:
        # floor(hll_estimate(collected per-key registers)) per key
        import math

        from nlp_to_nosql_spark.operators.sketch import (
            hll_ndv_by,
            hll_registers_by,
        )

        vals = self._keyed_vocab(spark, {"a": 2500, "b": 90, "c": 7})
        got = {
            r["k"]: r["ndv_est"]
            for r in hll_ndv_by(vals, ["k"], "tok", m=64).collect()
        }
        regs = hll_registers_by(vals, ["k"], "tok", m=64).collect()
        for key in ("a", "b", "c"):
            est = hll_estimate(
                [
                    (r["reg"], r["max_rho"])
                    for r in regs
                    if r["k"] == key
                ],
                m=64,
            )
            assert got[key] == math.floor(est), key

    def test_ndv_by_within_error_bound_per_key(self, spark):
        from nlp_to_nosql_spark.operators.sketch import hll_ndv_by

        sizes = {"big": 5000, "small": 400}
        vals = self._keyed_vocab(spark, sizes)
        got = {
            r["k"]: r["ndv_est"]
            for r in hll_ndv_by(vals, ["k"], "tok", m=64).collect()
        }
        for key, n in sizes.items():
            assert abs(got[key] - n) / n < 0.4, (key, got[key])

    def test_ndv_by_duckdb_twin_parity(self, spark, tmp_path):
        import duckdb

        from nlp_to_nosql_spark.operators.sketch import (
            hll_ndv_by,
            hll_ndv_by_sql,
            tokens_by,
        )

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma", "en"),
                (2, "delta epsilon", "en"),
                (3, "un deux trois quatre", "fr"),
                (4, "alpha beta", "en"),
            ],
            "doc_id long, text string, lang string",
        )
        pq = str(tmp_path / "docs.parquet")
        docs.write.mode("overwrite").parquet(pq)
        got = {
            r["lang"]: r["ndv_est"]
            for r in hll_ndv_by(
                tokens_by(docs, ["lang"]), ["lang"], "tok", m=64
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{pq}/*.parquet')"
        )
        want = {
            r[0]: r[1]
            for r in con.execute(
                hll_ndv_by_sql("documents", ["lang"], "text", m=64)
            ).fetchall()
        }
        assert got == want

    def test_overlap_identical_and_disjoint(self, spark):
        from nlp_to_nosql_spark.operators.sketch import hll_overlap

        a = self._keyed_vocab(spark, {"x": 3000}).select("tok")
        r = hll_overlap(a, a, "tok").collect()[0]
        # identical inputs: union == both sides, Jaccard exactly 1
        assert r["ndv_a"] == r["ndv_b"] == r["ndv_union"]
        assert r["ndv_intersect"] == r["ndv_a"]
        assert r["jaccard_micro"] == 1_000_000
        b = self._keyed_vocab(spark, {"y": 3000}).select("tok")
        r2 = hll_overlap(a, b, "tok").collect()[0]
        # disjoint vocabularies: intersection small relative to union
        # (sketch noise can make it nonzero, but far below either side)
        assert r2["ndv_union"] > max(r2["ndv_a"], r2["ndv_b"]) * 1.5
        assert r2["jaccard_micro"] < 200_000

    def test_overlap_tracks_true_jaccard(self, spark):
        from nlp_to_nosql_spark.operators.sketch import hll_overlap

        # A = 0..5999, B = 3000..8999: true Jaccard = 3000/9000 = 1/3
        a = self._keyed_vocab(spark, {"v": 6000}).select("tok")
        b = (
            spark.range(3000, 9000)
            .selectExpr("concat('v:tok', CAST(id AS STRING)) AS tok")
        )
        r = hll_overlap(a, b, "tok").collect()[0]
        assert abs(r["jaccard_micro"] / 1e6 - 1 / 3) < 0.25

    def test_overlap_duckdb_twin_parity(self, spark, tmp_path):
        import duckdb

        from nlp_to_nosql_spark.operators.sketch import (
            hll_overlap,
            hll_overlap_sql,
        )

        vals = self._keyed_vocab(spark, {"p": 800, "q": 500})
        pq = str(tmp_path / "vals.parquet")
        vals.write.mode("overwrite").parquet(pq)
        a = vals.filter(F.col("k") == "p").select("tok")
        b = vals.filter(F.col("k") == "q").select("tok")
        got = hll_overlap(a, b, "tok").collect()[0].asDict()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW v AS SELECT * FROM read_parquet('{pq}/*.parquet')"
        )
        want = dict(
            zip(
                ("ndv_a", "ndv_b", "ndv_union", "ndv_intersect",
                 "jaccard_micro"),
                con.execute(
                    hll_overlap_sql(
                        "SELECT tok FROM v WHERE k = 'p'",
                        "SELECT tok FROM v WHERE k = 'q'",
                    )
                ).fetchall()[0],
            )
        )
        assert got == want

    def test_cms_overestimate_bound_two_configs(self, spark):
        """The CMS guarantee, pinned like HLL's ±1.04/√m rows: estimates
        never undercount, and the per-token overestimate exceeds 2N/width
        for at most a 2^-depth fraction of tokens (per md5 row, Markov
        gives P[overcount ≥ 2N/width] ≤ 1/2; the min over depth rows
        multiplies).  Deterministic inputs + md5 make the measured
        fractions constants: 0 violations at both configs (documented in
        PERFORMANCE.md "CMS width/depth sizing")."""
        from nlp_to_nosql_spark.operators.sketch import cms_heavy_hitters

        V = 2000
        df = (
            spark.range(V)
            .select(
                F.expr("concat('tok', CAST(id AS STRING))").alias("t"),
                (F.col("id") % 10 + 1).cast("int").alias("c"),
            )
            .select(
                F.expr("array_join(array_repeat(t, c), ' ')").alias("text")
            )
        )
        n_total = sum((i % 10) + 1 for i in range(V))
        for depth, width in ((4, 1024), (2, 256)):
            rows = cms_heavy_hitters(
                df, depth=depth, width=width, top_n=V
            ).collect()
            assert len(rows) == V
            assert all(r["est_cnt"] >= r["true_cnt"] for r in rows)
            bound = 2 * n_total / width
            viol = sum(
                1 for r in rows if r["est_cnt"] - r["true_cnt"] > bound
            )
            assert viol / V <= 2**-depth, (depth, width, viol)

    def test_empty_and_null_values_are_not_counted(self, spark):
        """The family contract: NULL and '' are filtered before hashing
        (matching the SQL twins' WHERE tok <> ''), so a frame polluted
        with them sketches identically to the clean frame — including
        through the overlap path, where the twin previously diverged."""
        import duckdb

        from nlp_to_nosql_spark.operators.sketch import (
            hll_overlap,
            hll_overlap_sql,
            hll_registers_by,
            hll_registers_of,
        )

        clean = self._keyed_vocab(spark, {"p": 300})
        noisy = clean.unionByName(
            spark.createDataFrame(
                [("p", ""), ("p", None), ("p", "")], "k string, tok string"
            )
        )
        reg = lambda df: sorted(  # noqa: E731
            (r["reg"], r["max_rho"])
            for r in hll_registers_of(df.select("tok"), "tok").collect()
        )
        assert reg(noisy) == reg(clean)
        regby = lambda df: sorted(  # noqa: E731
            (r["k"], r["reg"], r["max_rho"])
            for r in hll_registers_by(df, ["k"], "tok").collect()
        )
        assert regby(noisy) == regby(clean)
        got = hll_overlap(
            noisy.select("tok"), clean.select("tok"), "tok"
        ).collect()[0].asDict()
        con = duckdb.connect()
        con.register("noisy", noisy.toPandas())
        con.register("clean", clean.toPandas())
        want = dict(
            zip(
                ("ndv_a", "ndv_b", "ndv_union", "ndv_intersect",
                 "jaccard_micro"),
                con.execute(
                    hll_overlap_sql(
                        "SELECT tok FROM noisy", "SELECT tok FROM clean"
                    )
                ).fetchall()[0],
            )
        )
        assert got == want
        assert got["jaccard_micro"] == 1_000_000

    def test_cms_by_matches_per_key_global(self, spark):
        from nlp_to_nosql_spark.operators.sketch import (
            cms_heavy_hitters,
            cms_heavy_hitters_by,
        )

        docs = spark.createDataFrame(
            [
                (i, "en" if i % 3 else "fr",
                 f"alpha tok{i % 5} beta tok{i % 3}")
                for i in range(60)
            ],
            "doc_id long, lang string, text string",
        )
        grouped = {
            (r["lang"], r["tok"]): (r["true_cnt"], r["est_cnt"])
            for r in cms_heavy_hitters_by(
                docs, ["lang"], top_n=5
            ).collect()
        }
        for lang in ("en", "fr"):
            solo = {
                (lang, r["tok"]): (r["true_cnt"], r["est_cnt"])
                for r in cms_heavy_hitters(
                    docs.filter(F.col("lang") == lang), top_n=5
                ).collect()
            }
            sub = {k: v for k, v in grouped.items() if k[0] == lang}
            # a key's grouped sketch must equal the global sketch run on
            # that key's rows alone (the key joins the cell grouping, so
            # no cross-key collisions exist to widen the estimate)
            assert {k: v[0] for k, v in sub.items()} == {
                k: v[0] for k, v in solo.items()
            }
            assert all(sub[k][1] == solo[k][1] for k in sub), lang
        assert all(est >= true for true, est in grouped.values())

    def test_cms_by_duckdb_twin_parity(self, spark, tmp_path):
        import duckdb

        from nlp_to_nosql_spark.operators.sketch import (
            cms_heavy_hitters_by,
            cms_heavy_hitters_by_sql,
        )

        docs = spark.createDataFrame(
            [
                (i, "p" if i % 2 else "q", f"w{i % 4} W{i % 6} common")
                for i in range(50)
            ],
            "doc_id long, lang string, text string",
        )
        pq = str(tmp_path / "docs.parquet")
        docs.write.mode("overwrite").parquet(pq)
        got = {
            (r["lang"], r["tok"]): (r["true_cnt"], r["est_cnt"])
            for r in cms_heavy_hitters_by(docs, ["lang"], top_n=4).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{pq}/*.parquet')"
        )
        want = {
            (r[0], r[1]): (r[2], r[3])
            for r in con.execute(
                cms_heavy_hitters_by_sql("documents", ["lang"], top_n=4)
            ).fetchall()
        }
        assert got == want

    def test_key_cols_required(self, spark):
        from nlp_to_nosql_spark.operators.sketch import hll_registers_by

        df = spark.createDataFrame([("x", "t")], "k string, tok string")
        with pytest.raises(ValueError, match="key_cols"):
            hll_registers_by(df, [], "tok")


def test_unicode_tokens_hash_cross_engine(spark):
    # md5 of non-ASCII tokens must agree between Spark (UTF-8 bytes of
    # the Java string) and the DuckDB/python reference (UTF-8 bytes) —
    # the assumption every md5-family oracle rests on
    import hashlib

    toks = ["héllo", "wörld", "日本語", "emoji😀tok"]
    df = spark.createDataFrame([(" ".join(toks),)], ["text"])
    got = {
        r["reg"]: r["max_rho"]
        for r in hll_registers(df, "text", m=64).collect()
    }
    regs: dict[int, int] = {}
    for t in toks:
        h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
        reg, v = h % 64, h >> 6
        regs[reg] = max(regs.get(reg, 0), _py_rho(v, 55))
    assert got == regs


# ---------------------------------------------------------------------------
# KMV bottom-k sketch
# ---------------------------------------------------------------------------


def test_kmv_exact_regime_below_k(spark):
    """Fewer distinct tokens than k → the sketch IS the distinct set and
    ndv_est is exact."""
    from nlp_to_nosql_spark.operators.sketch import kmv_by

    df = spark.createDataFrame(
        [("a", "x y z x y"), ("a", "z w")], "lang string, text string"
    )
    row = kmv_by(df, ["lang"], "text", k=64).collect()[0]
    assert row["n_kept"] == 4  # x y z w
    assert row["ndv_est"] == 4
    assert list(row["kmv"]) == sorted(row["kmv"])


def test_kmv_estimator_tracks_true_ndv(spark):
    """1000 distinct tokens, k=64 → estimate within 30% (KMV σ ≈
    1/√(k−2) ≈ 12.7%)."""
    from nlp_to_nosql_spark.operators.sketch import kmv_by

    text = " ".join(f"tok{i}" for i in range(1000))
    df = spark.createDataFrame([("a", text)], "lang string, text string")
    row = kmv_by(df, ["lang"], "text", k=64).collect()[0]
    assert row["n_kept"] == 64
    assert 700 <= row["ndv_est"] <= 1300


def test_kmv_jaccard_exact_when_sets_small(spark):
    """Below k the sketches are the full sets → Jaccard is exact."""
    from nlp_to_nosql_spark.operators.sketch import kmv_by, kmv_jaccard_pairs

    df = spark.createDataFrame(
        [("a", "p q r s"), ("b", "r s t u")], "lang string, text string"
    )
    sk = kmv_by(df, ["lang"], "text", k=64)
    row = kmv_jaccard_pairs(sk, "lang", k=64).collect()[0]
    assert (row["key_a"], row["key_b"]) == ("a", "b")
    assert row["union_k"] == 6 and row["inter_k"] == 2
    assert row["jaccard_est"] == round(2 / 6, 6)


def test_kmv_sketch_merges_by_union_rerank(spark):
    """KMV merge law: bottom-k of (A ∪ B) == bottom-k of
    (sketch(A) ∪ sketch(B)) — the shard-merge discipline."""
    from nlp_to_nosql_spark.operators.sketch import kmv_by

    ta = " ".join(f"a{i}" for i in range(200))
    tb = " ".join(f"b{i}" for i in range(200))
    k = 16
    both = spark.createDataFrame(
        [("u", ta), ("u", tb)], "lang string, text string"
    )
    parts = spark.createDataFrame(
        [("a", ta), ("b", tb)], "lang string, text string"
    )
    merged_direct = list(
        kmv_by(both, ["lang"], "text", k=k).collect()[0]["kmv"]
    )
    shards = {
        r["lang"]: list(r["kmv"])
        for r in kmv_by(parts, ["lang"], "text", k=k).collect()
    }
    rerank = sorted(set(shards["a"]) | set(shards["b"]))[:k]
    assert merged_direct == rerank
