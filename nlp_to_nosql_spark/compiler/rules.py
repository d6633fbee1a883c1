"""Deterministic rule-based NL→IR compiler.

Reproduces the observable behavior of the reference's fallback compiler
(``_create_fallback_query``, ``No_Sql.py:316-377``) exactly, including rule
precedence (salary > age > department > name-projection > experience >
find-all default) and the per-rule keyword/direction vocabularies.  This is
the always-available, network-free path; the LLM front end (compiler.llm) is
optional and emits the same IR.

Pure Python — no Spark dependency — so golden tests run without a session.
"""

from __future__ import annotations

import re
from typing import Any

from nlp_to_nosql_spark.ir import DEFAULT_LIMIT, QuerySpec

# Rule vocabularies, verbatim from the reference (file:line cited per rule).
_SALARY_WORDS = ("salary", "earn", "pay", "income")          # No_Sql.py:322
_GT_WORDS_SALARY = ("above", "over", "more", "greater", ">")  # No_Sql.py:326
_LT_WORDS_SALARY = ("below", "under", "less", "<")            # No_Sql.py:328
_GT_WORDS_AGE = ("older", "above", "over")                    # No_Sql.py:338
_LT_WORDS_AGE = ("younger", "below", "under")                 # No_Sql.py:340
_GT_WORDS_EXP = ("more", "over", "above")                     # No_Sql.py:370
_LT_WORDS_EXP = ("less", "under", "below")                    # No_Sql.py:372

# Synonym→department map; insertion order is the match order
# (dict-ordered iteration with substring `in` matching — No_Sql.py:344-358).
_DEPARTMENTS = {
    "engineer": "engineering",
    "engineering": "engineering",
    "developer": "engineering",
    "dev": "engineering",
    "marketing": "marketing",
    "market": "marketing",
    "sales": "sales",
    "sale": "sales",
    "hr": "hr",
    "human": "hr",
}

_NAME_WORDS = ("name", "names")  # No_Sql.py:362


def _first_int(text: str) -> int | None:
    """First integer literal in the raw (not lowercased) text
    (``re.findall(r'\\d+', nl_text)`` → ``int(numbers[0])``,
    ``No_Sql.py:323-325``)."""
    numbers = re.findall(r"\d+", text)
    return int(numbers[0]) if numbers else None


def nl_to_ir(nl_text: str) -> dict[str, Any]:
    """Compile an NL string to the raw dict IR, first-match-wins.

    Mirrors ``No_Sql.py:316-377`` rule for rule.  Note the age and
    experience rules have **no equality default** — lacking a direction
    word they fall through to later rules (``No_Sql.py:334-341,366-373``).
    """
    text_lower = nl_text.lower()

    # 1. Salary (No_Sql.py:322-331)
    if any(w in text_lower for w in _SALARY_WORDS):
        num = _first_int(nl_text)
        if num is not None:
            if any(w in text_lower for w in _GT_WORDS_SALARY):
                return {"filter": {"salary": {"$gt": num}}, "projection": {}}
            if any(w in text_lower for w in _LT_WORDS_SALARY):
                return {"filter": {"salary": {"$lt": num}}, "projection": {}}
            return {"filter": {"salary": num}, "projection": {}}

    # 2. Age (No_Sql.py:334-341) — falls through without a direction word.
    if "age" in text_lower:
        num = _first_int(nl_text)
        if num is not None:
            if any(w in text_lower for w in _GT_WORDS_AGE):
                return {"filter": {"age": {"$gt": num}}, "projection": {}}
            if any(w in text_lower for w in _LT_WORDS_AGE):
                return {"filter": {"age": {"$lt": num}}, "projection": {}}

    # 3. Department synonyms (No_Sql.py:344-359)
    for keyword, dept in _DEPARTMENTS.items():
        if keyword in text_lower:
            return {
                "filter": {"department": {"$regex": dept, "$options": "i"}},
                "projection": {},
            }

    # 4. Name projection (No_Sql.py:362-363)
    if any(w in text_lower for w in _NAME_WORDS):
        return {"filter": {}, "projection": {"name": 1}}

    # 5. Experience (No_Sql.py:366-373)
    if "experience" in text_lower:
        num = _first_int(nl_text)
        if num is not None:
            if any(w in text_lower for w in _GT_WORDS_EXP):
                return {
                    "filter": {"experience_years": {"$gt": num}},
                    "projection": {},
                }
            if any(w in text_lower for w in _LT_WORDS_EXP):
                return {
                    "filter": {"experience_years": {"$lt": num}},
                    "projection": {},
                }

    # 6. Default: find-all (No_Sql.py:375-377)
    return {"filter": {}, "projection": {}}


def nl_to_queryspec(nl_text: str, limit: int = DEFAULT_LIMIT) -> QuerySpec:
    """Compile NL text straight to a validated :class:`QuerySpec`."""
    return QuerySpec.from_ir(nl_to_ir(nl_text), limit=limit)
