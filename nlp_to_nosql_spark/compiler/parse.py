"""LLM-response → IR parser with layered repair strategies.

Mirrors ``_parse_llm_response`` (``No_Sql.py:269-302``) and
``_validate_query_object`` (``No_Sql.py:304-314``):

1. strip code fences / backticks,
2. direct ``json.loads``,
3. quote repair (single→double quotes, quote bare keys) and reparse,
4. regex-extract the first ``{...}`` blob (DOTALL) and reparse,
5. on total failure, fall back to the deterministic rule compiler.

Pure Python; exercised by tests without any LLM.
"""

from __future__ import annotations

import json
import re
from typing import Any

from nlp_to_nosql_spark.compiler.rules import nl_to_ir


def validate_query_object(obj: Any) -> dict[str, Any]:
    """Structural validation: non-dict → empty query; inject missing
    ``filter``/``projection`` keys (``No_Sql.py:304-314``)."""
    if not isinstance(obj, dict):
        return {"filter": {}, "projection": {}}
    if "filter" not in obj:
        obj["filter"] = {}
    if "projection" not in obj:
        obj["projection"] = {}
    return obj


def parse_llm_response(raw_response: str, original_query: str) -> dict[str, Any]:
    """Parse raw LLM output into a valid IR dict; never raises."""
    cleaned = re.sub(r"```json|```|`", "", raw_response).strip()

    # Strategy 1: direct parse (No_Sql.py:274-279)
    try:
        return validate_query_object(json.loads(cleaned))
    except json.JSONDecodeError:
        pass

    # Strategy 2: quote repair (No_Sql.py:281-289).  Key pattern notes:
    # [$\w]+ covers Mongo operator keys ($gt, $in — the most common
    # bare-key shape an LLM emits); the [{,\s] lookbehind restricts the
    # rewrite to key position, so already-quoted keys (preceded by ")
    # and colons inside quoted values ("10:30") are left alone.
    try:
        fixed = cleaned.replace("'", '"')
        fixed = re.sub(r"(?<=[{,\s])([$\w]+)\s*:", r'"\1":', fixed)
        return validate_query_object(json.loads(fixed))
    except json.JSONDecodeError:
        pass

    # Strategy 3: extract first {...} blob (No_Sql.py:291-298)
    try:
        match = re.search(r"\{.*\}", cleaned, re.DOTALL)
        if match:
            return validate_query_object(json.loads(match.group()))
    except Exception:
        pass

    # Strategy 4: deterministic fallback compiler (No_Sql.py:300-302)
    return nl_to_ir(original_query)
