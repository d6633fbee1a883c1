"""Mongo read paths, offline: Extended-JSON decode of a mongoexport
fixture, connector feature detection, and the conf-gated catalog route
(reference executes against live mongod, ``No_Sql.py:389-404``; the
parquet path must stay untouched when the conf is unset)."""

from __future__ import annotations

import datetime
import json
import os

import pytest

from nlp_to_nosql_spark.sources.mongo import (
    decode_extended_json,
    read_mongo,
    read_mongoexport,
)

#: A mongoexport-style JSONL fixture covering both canonical and relaxed
#: Extended JSON v2 forms, nesting, and arrays.
_FIXTURE_LINES = [
    {
        "_id": {"$oid": "65f1a2b3c4d5e6f7a8b9c0d1"},
        "name": "Alice",
        "salary": {"$numberLong": "55000"},
        "age": {"$numberInt": "31"},
        "score": {"$numberDouble": "0.75"},
        "joined": {"$date": {"$numberLong": "1717243496789"}},
        "tags": ["eng", "ml"],
        "address": {"city": "Springfield", "zip": {"$numberInt": "12345"}},
        "logins": [{"$date": {"$numberLong": "1717243496789"}}],
    },
    {
        "_id": {"$oid": "65f1a2b3c4d5e6f7a8b9c0d2"},
        "name": "Bob",
        "salary": {"$numberLong": "42000"},
        "age": {"$numberInt": "45"},
        "score": {"$numberDouble": "0.5"},
        "joined": {"$date": "2024-01-15T08:30:00Z"},
        "tags": [],
        "address": {"city": "Shelbyville", "zip": {"$numberInt": "54321"}},
        "logins": [],
    },
]


@pytest.fixture()
def export_path(tmp_path):
    p = os.path.join(tmp_path, "employees.jsonl")
    with open(p, "w") as f:
        for doc in _FIXTURE_LINES:
            f.write(json.dumps(doc) + "\n")
    return p


def test_mongoexport_decodes_to_native_types(spark, export_path):
    df = read_mongoexport(spark, export_path)
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema["_id"] == "string"
    assert schema["salary"] == "bigint"
    assert schema["age"] == "int"
    assert schema["score"] == "double"
    assert schema["joined"] == "timestamp"
    assert schema["logins"] == "array<timestamp>"
    assert schema["address"] == "struct<city:string,zip:int>"

    rows = {r["name"]: r for r in df.collect()}
    a = rows["Alice"]
    assert a["_id"] == "65f1a2b3c4d5e6f7a8b9c0d1"
    assert a["salary"] == 55000 and a["age"] == 31 and a["score"] == 0.75
    # canonical $date is epoch millis (session zone is UTC)
    assert a["joined"] == datetime.datetime(2024, 6, 1, 12, 4, 56, 789000)
    assert a["logins"] == [a["joined"]]
    assert a["address"]["zip"] == 12345
    b = rows["Bob"]
    # relaxed $date parses the ISO-8601 form
    assert b["joined"] == datetime.datetime(2024, 1, 15, 8, 30)
    assert b["tags"] == [] and b["logins"] == []


def test_decode_is_pure_catalyst(spark, export_path):
    """The wrapper decode must stay JVM-side — no Python eval nodes."""
    df = read_mongoexport(spark, export_path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_connector_absence_degrades_clearly(spark):
    """Without the connector jar, read_mongo must raise the actionable
    remediation, not a raw DATA_SOURCE_NOT_FOUND."""
    with pytest.raises(RuntimeError, match="mongo-spark-connector"):
        read_mongo(spark, "mongodb://localhost:27017", "testdb", "customer")


def test_catalog_routes_to_mongo_only_when_conf_set(spark):
    """load_table is parquet-first; the Mongo route engages only under
    spark.nlp2nosql.source.mongo.uri — and then goes through read_mongo
    (which, offline, surfaces the connector remediation)."""
    from nlp_to_nosql_spark.sources.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "customer")
    assert ev.count() > 0  # parquet path untouched

    spark.conf.set("spark.nlp2nosql.source.mongo.uri", "mongodb://localhost:27017")
    try:
        with pytest.raises(RuntimeError, match="mongo-spark-connector"):
            load_table(spark, "/root/testdata/sf0.001", "customer")
    finally:
        spark.conf.unset("spark.nlp2nosql.source.mongo.uri")


def test_null_struct_stays_null(spark, tmp_path):
    """{"address": null} must decode to a NULL struct, not a struct of
    NULLs — F.struct over null fields is never null without the guard."""
    p = os.path.join(tmp_path, "d.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"name": "A", "address": {"city": "X", "zip": {"$numberInt": "1"}}}) + "\n")
        f.write(json.dumps({"name": "B", "address": None}) + "\n")
    df = read_mongoexport(spark, p)
    rows = {r["name"]: r for r in df.collect()}
    assert rows["A"]["address"]["city"] == "X" and rows["A"]["address"]["zip"] == 1
    assert rows["B"]["address"] is None
    assert df.filter("address IS NULL").count() == 1


def test_register_tables_honors_mongo_conf(spark):
    """register_tables — the entry point the Engine/server/bench use —
    must route through Mongo when the conf is set (and surface connector
    absence) rather than silently registering nothing because no local
    parquet exists."""
    from nlp_to_nosql_spark.sources.catalog import register_tables

    spark.conf.set("spark.nlp2nosql.source.mongo.uri", "mongodb://localhost:27017")
    try:
        with pytest.raises(RuntimeError, match="mongo-spark-connector"):
            register_tables(spark, "/nonexistent/sfdir")
    finally:
        spark.conf.unset("spark.nlp2nosql.source.mongo.uri")
