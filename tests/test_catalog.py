"""Catalog must be self-sufficient on ANY session (the driver's included).

Round-1 regression: the harness-provided SparkSession does not set
``spark.sql.legacy.parquet.nanosAsLong``, and events.parquet stores
TIMESTAMP(NANOS) — every contract query failed at registration.
``register_tables``/``load_table`` now set the conf themselves.
"""

from __future__ import annotations

from pyspark.sql import types as T

from nlp_to_nosql_spark.sources.catalog import load_table, register_tables

SF_DIR = "/root/testdata/sf0.001"


def test_register_tables_without_legacy_conf(spark):
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        tables = register_tables(spark, SF_DIR)
        assert "events" in tables
        # Current testdata stores ts as TIMESTAMP(MICROS) → native NTZ read;
        # older generations stored TIMESTAMP(NANOS) → legacy long → TZ
        # timestamp.  Both must come out as a timestamp type, never a long.
        assert isinstance(
            tables["events"].schema["ts"].dataType,
            (T.TimestampType, T.TimestampNTZType),
        )
        assert tables["events"].count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_load_table_without_legacy_conf(spark):
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        ev = load_table(spark, SF_DIR, "events")
        assert isinstance(
            ev.schema["ts"].dataType, (T.TimestampType, T.TimestampNTZType)
        )
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
