"""Regression tests for the selfcheck harness's type sensitivity.

Round 3 shipped a selfcheck that coerced ``Decimal(5) == 5`` and so said
"OK" on two queries the driver's Arrow-level hash failed (DuckDB types a
windowed integer SUM as DECIMAL(38,0); Spark emits BIGINT).  These tests
pin the property that made that possible closed: the comparison primitives
must distinguish int / Decimal / float at both the value and Arrow-schema
level, so the pre-fix ``SESSIONIZE_SQL`` class of miss cannot pass locally
again.
"""

import decimal
import os
import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.selfcheck import arrow_table_rows, canon, row_multiset, type_sig


def test_canon_decimal_never_equals_int():
    assert canon(decimal.Decimal(5)) != canon(5)
    assert canon(decimal.Decimal("5.0")) != canon(5.0)


def test_canon_float_is_bit_exact():
    assert canon(0.1 + 0.2) != canon(0.3)          # last-ulp drift visible
    assert canon(-0.0) != canon(0.0)               # sign bit visible
    assert canon(float("nan")) == canon(float("nan"))
    assert canon(1.0) != canon(1)                  # float vs int tag


def test_type_sig_separates_int_decimal_float_and_widths():
    assert type_sig(pa.decimal128(38, 0)) == "decimal"
    # categories distinct
    assert len({type_sig(pa.int64()), type_sig(pa.decimal128(38, 0)),
                type_sig(pa.float64())}) == 3
    # widths distinct within a category (int32-vs-int64 oracle mismatches
    # hash-miss on the driver just like the DECIMAL case)
    assert type_sig(pa.int32()) != type_sig(pa.int64())
    assert type_sig(pa.float32()) != type_sig(pa.float64())


def test_prefix_sessionize_sql_class_is_caught():
    """A DuckDB windowed integer SUM without the BIGINT cast must surface
    as an int-vs-decimal mismatch (the exact rj1/sess1 round-3 red)."""
    con = duckdb.connect()
    uncast = con.execute(
        "SELECT SUM(x) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS s "
        "FROM (VALUES (1), (2)) t(x)"
    ).arrow()
    cast = con.execute(
        "SELECT CAST(SUM(x) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) "
        "AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)"
    ).arrow()
    spark_like = pa.table({"s": pa.array([1, 3], type=pa.int64())})

    _, urows, usigs = arrow_table_rows(uncast)
    _, crows, csigs = arrow_table_rows(cast)
    scols, srows, ssigs = arrow_table_rows(spark_like)

    # Pre-fix shape: schema-category mismatch AND value-multiset mismatch.
    assert usigs["s"] == "decimal" and ssigs["s"] == "int64"
    assert row_multiset(["s"], urows) != row_multiset(scols, srows)
    # Post-fix shape: both green.
    assert csigs["s"] == "int64"
    assert row_multiset(["s"], crows) == row_multiset(scols, srows)


def test_shipped_sessionize_sql_session_idx_is_bigint():
    """The shipped oracle itself must keep emitting BIGINT session_idx."""
    from nlp_to_nosql_spark.operators.sessions import SESSIONIZE_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        "(1, TIMESTAMP '2024-01-01 00:00:00', 101, 1.5), "
        "(1, TIMESTAMP '2024-01-01 02:00:00', 102, 2.5)"
        ") t(user_id, ts, event_id, value)"
    )
    tbl = con.execute(
        SESSIONIZE_SQL.format(gap_us=30 * 60 * 1_000_000)
    ).arrow()
    assert type_sig(tbl.schema.field("session_idx").type) == "int64"
