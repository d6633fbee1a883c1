"""Terminal client parity surface (reference ``main.py`` Streamlit UI):
query execution + rendering, CSV export, history dashboard."""

from __future__ import annotations

import pytest

from nlp_to_nosql_spark.api import Engine
from nlp_to_nosql_spark.cli import (
    render_history,
    render_result,
    results_csv_bytes,
    run_query,
)
from nlp_to_nosql_spark.sources.catalog import register_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine(spark):
    register_tables(spark, SF_DIR)
    return Engine(spark)


def test_run_query_and_render(engine, tmp_path):
    hist = str(tmp_path / "hist")
    resp = run_query(
        engine, "Find all employees", "customer", limit=3, history_path=hist
    )
    assert resp["ok"] and resp["result_count"] == 3
    text = render_result(resp)
    assert "Status: success" in text
    assert '"filter": {}' in text
    assert "Timing breakdown" in text
    # results table contains a real column header from customer
    assert "c_custkey" in text

    csv_bytes = results_csv_bytes(resp)
    lines = csv_bytes.decode().strip().splitlines()
    assert len(lines) == 4  # header + 3 rows
    assert "c_custkey" in lines[0]

    dashboard = render_history(engine.spark, hist)
    assert "Total queries: 1" in dashboard
    assert "Success rate: 100.0%" in dashboard
    assert "Find all employees" in dashboard


def test_error_envelope_renders_and_records(engine, tmp_path):
    hist = str(tmp_path / "hist_err")
    resp = run_query(engine, "Find all employees", "no_such_table",
                     history_path=hist)
    assert resp["ok"] is False
    text = render_result(resp)
    assert "Status: ERROR" in text
    dashboard = render_history(engine.spark, hist)
    assert "Success rate: 0.0%" in dashboard


def test_history_dashboard_without_history(spark):
    assert render_history(spark, "/nonexistent/path") == "No query history yet."


def test_demo_walkthrough(spark):
    """docs/demo.py (the five-minute three-surface walkthrough) must run
    offline end-to-end and exercise CLI, HTTP, and UI against real
    parquet — the committed DEMO_TRANSCRIPT.txt is its output."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "demo.py",
    )
    spec = importlib.util.spec_from_file_location("demo", path)
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    transcript = demo.run_demo(SF_DIR, spark=spark)
    for marker in (
        "1. CLI surface",
        "Status: success",
        '"$gt": 4000',
        "2. HTTP surface",
        '"total_matching"',
        "3. UI surface",
        'fetch("/query"',
        "Demo complete",
    ):
        assert marker in transcript, marker
