"""Driver-contract meta-tests over __spark_entry__ — no Spark session.

The driver consumes ``queries()`` / ``oracle_sql()`` as data; these pin
the contract's invariants cheaply (DuckDB parses every oracle against
the real table schemas in milliseconds), so a typo'd oracle or an
orphaned key fails here in seconds instead of inside the full
selfcheck/driver cycle.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry
from nlp_to_nosql_spark.sources.catalog import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

#: Queries allowed to ship without a DuckDB twin.  Round 6 retired the
#: last three (dedup3/dedup4 moved to md5-family configurations with
#: full relational-replay oracles; ann2 moved to the integer-exact SRP
#: family) — every contract query now carries a value-level oracle.
KNOWN_WEAK: set[str] = set()


def test_every_oracle_key_has_a_query():
    qs, osql = entry.queries(), entry.oracle_sql()
    orphans = set(osql) - set(qs)
    assert not orphans, f"oracle_sql keys without queries: {sorted(orphans)}"


def test_every_query_has_an_oracle():
    qs, osql = entry.queries(), entry.oracle_sql()
    weak = set(qs) - set(osql)
    assert weak == KNOWN_WEAK, (
        "un-oracled queries changed: every new query needs a DuckDB twin "
        f"or an explicit entry in KNOWN_WEAK with a documented reason; "
        f"got {sorted(weak)}"
    )


def test_queries_are_callable_and_uniquely_named():
    qs = entry.queries()
    assert len(qs) == len(set(qs))
    for name, fn in qs.items():
        assert callable(fn), name
        # bench.py keys the stdout JSON by family prefix — prefixes must
        # stay unique or two queries collide in BENCH_r{N}.json
    prefixes = [n.split("_", 1)[0] for n in qs]
    dupes = {p for p in prefixes if prefixes.count(p) > 1}
    assert not dupes, f"bench prefix collision: {sorted(dupes)}"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def test_no_nested_types_in_contract_schemas(duck):
    """Every contract query must emit SCALAR columns only.

    The driver's canonicalizer sorts the result frame with pandas before
    hashing; a top-level LIST/MAP/STRUCT column raises ``unhashable
    type`` there — before any value comparison — so the row can never go
    green (that is exactly how ``emb4_quantize`` failed in round 8).
    ``DESCRIBE`` on the oracle twin exposes the output types without
    executing, and the driver's ``schema_match`` forces Spark's types to
    mirror the oracle's, so guarding the oracle side guards both.
    """
    bad = {}
    for name, sql in entry.oracle_sql().items():
        try:
            cols = duck.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 — surfaced by the parse test
            bad[name] = f"DESCRIBE failed: {str(e).splitlines()[0]}"
            continue
        nested = [
            (c[0], c[1])
            for c in cols
            if "[]" in c[1] or c[1].startswith(("MAP", "STRUCT", "LIST"))
        ]
        if nested:
            bad[name] = nested
    assert not bad, f"contract queries with nested output columns: {bad}"


def test_every_oracle_sql_parses_and_binds(duck):
    """EXPLAIN (not execution) — catches syntax errors, missing columns,
    and type errors against the real parquet schemas in milliseconds."""
    bad = {}
    for name, sql in entry.oracle_sql().items():
        try:
            duck.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — collecting all failures
            bad[name] = str(e).splitlines()[0]
    assert not bad, f"oracle SQL fails to plan: {bad}"
