"""Golden NL→IR tests (FIXTURES.md §3 — reference few-shots, README example,
UI suggestions, one case per fallback-rule branch of No_Sql.py:316-377)."""

import pytest

from nlp_to_nosql_spark.compiler.rules import nl_to_ir, nl_to_queryspec
from nlp_to_nosql_spark.ir import QuerySpec

GOLDENS = [
    # (nl, expected filter, expected projection)
    ("Find engineers", {"department": {"$regex": "engineering", "$options": "i"}}, {}),
    ("employees earning over 60000", {"salary": {"$gt": 60000}}, {}),
    # fallback path hits the department rule before the name rule (precedence)
    ("names of marketing staff", {"department": {"$regex": "marketing", "$options": "i"}}, {}),
    ("employees with salary under 40000", {"salary": {"$lt": 40000}}, {}),
    ("salary 50000", {"salary": 50000}, {}),
    ("age older than 30", {"age": {"$gt": 30}}, {}),
    ("age younger than 25", {"age": {"$lt": 25}}, {}),
    # NOTE: "employees older than 30" (main.py:362) contains no 'age'
    # substring, so the reference fallback compiler (No_Sql.py:334) falls
    # through — dept/name/experience don't match either → find-all.  The
    # age-filter answer only comes from the LLM path.
    ("employees older than 30", {}, {}),
    ("show developers", {"department": {"$regex": "engineering", "$options": "i"}}, {}),
    ("human resources people", {"department": {"$regex": "hr", "$options": "i"}}, {}),
    ("list all names", {}, {"name": 1}),
    ("experience more than 5", {"experience_years": {"$gt": 5}}, {}),
    ("experience under 3", {"experience_years": {"$lt": 3}}, {}),
    ("Find all employees", {}, {}),
]


@pytest.mark.parametrize("nl,expected_filter,expected_projection", GOLDENS)
def test_goldens(nl, expected_filter, expected_projection):
    assert nl_to_ir(nl) == {"filter": expected_filter, "projection": expected_projection}


def test_salary_precedence_over_age():
    # salary rule fires first and sees no direction word here → equality,
    # taking the FIRST number (No_Sql.py:325)
    assert nl_to_ir("pay 70000 age 40") == {"filter": {"salary": 70000}, "projection": {}}


def test_age_without_direction_falls_through():
    # age rule has no equality default (No_Sql.py:334-341): "age 30" falls
    # through dept/name/experience to the find-all default
    assert nl_to_ir("age 30") == {"filter": {}, "projection": {}}


def test_age_falls_through_to_department():
    # "age 30 in sales" → age rule passes (no direction), dept rule catches
    assert nl_to_ir("age 30 in sales") == {
        "filter": {"department": {"$regex": "sales", "$options": "i"}},
        "projection": {},
    }


def test_salary_without_number_falls_through():
    # salary keyword but no number → rule skipped entirely (No_Sql.py:324)
    assert nl_to_ir("high salary people in marketing") == {
        "filter": {"department": {"$regex": "marketing", "$options": "i"}},
        "projection": {},
    }


def test_human_substring_matches_hr():
    # 'human' in "human resources" maps to hr (substring matching)
    assert nl_to_ir("all human resources")["filter"] == {
        "department": {"$regex": "hr", "$options": "i"}
    }


def test_first_number_wins():
    assert nl_to_ir("salary between 50000 and 90000")["filter"] == {"salary": 50000}


def test_queryspec_roundtrip_and_clamp():
    spec = nl_to_queryspec("list all names", limit=99999)
    assert spec.limit == 1000
    assert spec.projection == ("name",)
    assert spec.to_ir() == {"filter": {}, "projection": {"name": 1}}
    assert QuerySpec.from_ir(spec.to_ir()).projection == ("name",)


def test_from_ir_validation():
    # non-dict → empty query (No_Sql.py:306-307)
    assert QuerySpec.from_ir("nonsense") == QuerySpec()
    assert QuerySpec.from_ir(None) == QuerySpec()
    # missing keys injected (No_Sql.py:309-312)
    spec = QuerySpec.from_ir({"filter": {"a": 1}})
    assert spec.filter == {"a": 1} and spec.projection == ()
    # limit clamps low end too
    assert QuerySpec.from_ir({}, limit=-5).limit == 1
