"""IR-robustness tests mirroring the reference's three repair strategies
(No_Sql.py:269-302): malformed inputs → valid IR or fallback, never raise."""

from nlp_to_nosql_spark.compiler.parse import parse_llm_response, validate_query_object


def test_direct_json():
    out = parse_llm_response('{"filter": {"salary": {"$gt": 1}}, "projection": {}}', "x")
    assert out == {"filter": {"salary": {"$gt": 1}}, "projection": {}}


def test_code_fence_stripping():
    raw = '```json\n{"filter": {"age": {"$lt": 30}}, "projection": {}}\n```'
    assert parse_llm_response(raw, "x")["filter"] == {"age": {"$lt": 30}}


def test_single_quote_repair():
    raw = "{'filter': {'department': 'sales'}, 'projection': {}}"
    assert parse_llm_response(raw, "x")["filter"] == {"department": "sales"}


def test_regex_extraction_from_prose():
    raw = 'Sure! Here is your query: {"filter": {}, "projection": {"name": 1}} hope it helps'
    assert parse_llm_response(raw, "x")["projection"] == {"name": 1}


def test_total_garbage_falls_back_to_rule_compiler():
    out = parse_llm_response("I cannot do that", "employees earning over 60000")
    assert out == {"filter": {"salary": {"$gt": 60000}}, "projection": {}}


def test_missing_keys_injected():
    out = parse_llm_response('{"filter": {"a": 1}}', "x")
    assert out["projection"] == {}
    out = parse_llm_response('{"projection": {"a": 1}}', "x")
    assert out["filter"] == {}


def test_non_dict_json_yields_empty_query():
    assert parse_llm_response("[1, 2, 3]", "zzz") == {"filter": {}, "projection": {}}


def test_validate_non_dict():
    assert validate_query_object(42) == {"filter": {}, "projection": {}}


# ---------------------------------------------------------------------------
# property: the repair pipeline NEVER raises — any LLM output string yields
# a valid IR dict (reference guarantee R4: graceful degradation, the rule
# compiler is the always-works fallback — No_Sql.py:257-267)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_parse_never_raises_on_arbitrary_text(raw):
    from nlp_to_nosql_spark.compiler.parse import parse_llm_response

    ir = parse_llm_response(raw, "find all employees")
    assert isinstance(ir, dict)
    assert set(ir) >= {"filter", "projection"}
    assert isinstance(ir["filter"], dict)


@given(
    st.recursive(
        st.none() | st.booleans() | st.integers() | st.text(max_size=12),
        lambda child: st.lists(child, max_size=3)
        | st.dictionaries(st.text(max_size=8), child, max_size=3),
        max_leaves=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_parse_never_raises_on_arbitrary_json(obj):
    import json

    from nlp_to_nosql_spark.compiler.parse import parse_llm_response

    ir = parse_llm_response(json.dumps(obj), "find all employees")
    assert isinstance(ir, dict)
    assert set(ir) >= {"filter", "projection"}


def test_quote_repair_handles_mongo_operator_keys():
    """Bare $-keys are the most common unquoted LLM output; the repair
    must quote them, and must not touch colons inside quoted values."""
    from nlp_to_nosql_spark.compiler.parse import parse_llm_response

    raw = '{salary: {$gt: 50000}, projection: {}}'
    assert parse_llm_response(raw, "irrelevant") == {
        "filter": {},  # injected by validate
        "salary": {"$gt": 50000},
        "projection": {},
    } or parse_llm_response(raw, "irrelevant")["salary"] == {"$gt": 50000}

    raw2 = '{filter: {shift: "10:30"}, projection: {}}'
    assert parse_llm_response(raw2, "x")["filter"] == {"shift": "10:30"}
