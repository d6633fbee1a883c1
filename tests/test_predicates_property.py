"""Property-based check of the predicate compiler (SURVEY §5 strategy):
random Mongo-shaped filter trees evaluated two ways — the Spark Column
compiled by ``compile_predicate`` and a pure-Python reference evaluator
implementing the documented Mongo semantics — must select identical row
sets.  Catches operator/null-semantics drift that example tests miss.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from nlp_to_nosql_spark.plans.predicates import compile_predicate

# ---------------------------------------------------------------------------
# fixed corpus: small value domains + nulls so operators hit all branches
# ---------------------------------------------------------------------------

NAMES = ["ana", "bob", "cara", "Ana", "BOB", None]
DEPTS = ["eng", "hr", "sales", None]
ROWS = [
    (i, NAMES[i % len(NAMES)], DEPTS[i % len(DEPTS)], (i * 7) % 5, (i * 13) % 9)
    for i in range(30)
]
COLUMNS = ["row_id", "name", "department", "age", "salary"]

SCHEMA = T.StructType(
    [
        T.StructField("row_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("department", T.StringType()),
        T.StructField("age", T.LongType()),
        T.StructField("salary", T.LongType()),
    ]
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


# ---------------------------------------------------------------------------
# reference evaluator — mirrors plans/predicates.py semantics exactly
# ---------------------------------------------------------------------------

def _ref_field(val, spec):
    if not isinstance(spec, dict):
        return val is None if spec is None else (val is not None and val == spec)
    ok = True
    for op, operand in spec.items():
        if op == "$options":
            continue
        if op in ("$gt", "$lt", "$gte", "$lte"):
            if val is None:
                ok = False
            elif op == "$gt":
                ok = ok and val > operand
            elif op == "$lt":
                ok = ok and val < operand
            elif op == "$gte":
                ok = ok and val >= operand
            else:
                ok = ok and val <= operand
        elif op == "$eq":
            ok = ok and (val is None if operand is None else val == operand)
        elif op == "$ne":
            if operand is None:
                ok = ok and val is not None
            else:
                ok = ok and (val is None or val != operand)
        elif op == "$in":
            vals = list(operand)
            non_null = [v for v in vals if v is not None]
            hit = val is not None and val in non_null
            if None in vals:
                hit = hit or val is None
            ok = ok and hit
        elif op == "$regex":
            pat = str(spec["$regex"])
            flags = re.I if "i" in str(spec.get("$options", "")).lower() else 0
            ok = ok and (val is not None and re.search(pat, val, flags) is not None)
        if not ok:
            return False
    return ok


def ref_matches(filter_tree):
    out = []
    for row in ROWS:
        rec = dict(zip(COLUMNS, row))
        if all(_ref_field(rec[f], spec) for f, spec in filter_tree.items()):
            out.append(rec["row_id"])
    return sorted(out)


# ---------------------------------------------------------------------------
# filter-tree strategies (literal-only regex patterns: dialect-neutral)
# ---------------------------------------------------------------------------

ints = st.integers(min_value=-1, max_value=9)
words = st.sampled_from(["a", "an", "bo", "car", "eng", "hr", "x", "ANA"])
num_field = st.sampled_from(["age", "salary", "row_id"])
str_field = st.sampled_from(["name", "department"])

num_ops = st.dictionaries(
    st.sampled_from(["$gt", "$lt", "$gte", "$lte", "$eq", "$ne"]),
    ints,
    min_size=1,
    max_size=2,
) | st.fixed_dictionaries(
    {"$in": st.lists(ints | st.none(), min_size=0, max_size=3)}
)

str_ops = (
    st.dictionaries(
        st.sampled_from(["$eq", "$ne"]), words | st.none(), min_size=1, max_size=1
    )
    | st.fixed_dictionaries(
        {"$in": st.lists(words | st.none(), min_size=0, max_size=3)}
    )
    | st.fixed_dictionaries(
        {"$regex": words, "$options": st.sampled_from(["", "i"])}
    )
)

num_entry = st.tuples(num_field, num_ops | ints)
str_entry = st.tuples(str_field, str_ops | words | st.none())

filter_trees = st.lists(
    num_entry | str_entry, min_size=0, max_size=3, unique_by=lambda e: e[0]
).map(dict)


@given(filter_trees)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_compiled_predicate_matches_reference(corpus, tree):
    pred = compile_predicate(tree, schema_fields=COLUMNS)
    df = corpus if pred is None else corpus.filter(pred)
    got = sorted(r["row_id"] for r in df.select("row_id").collect())
    assert got == ref_matches(tree), f"filter tree: {tree!r}"
