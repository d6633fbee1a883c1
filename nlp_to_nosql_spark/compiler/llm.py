"""Optional LLM front end: prompt-template NL→IR compiler (C1-C3).

Mirrors the reference's LLM path (``NLPProcessor.generate_mongo_query``,
``No_Sql.py:211-267``) with two deliberate changes:

* **The schema comes from the data** (``df.schema``), not a hard-coded
  prompt string — fixing the reference's silent drift between its prompt
  (``joining_date``, ``No_Sql.py:115``) and README (``join_date``).
* **The completion callable is injected.**  The engine never talks to a
  network itself; callers pass any ``complete: str -> str`` (an LLM
  client, a cache, a test fake).  With no callable configured the
  compiler falls back to the deterministic rule path, exactly like the
  reference does on LLM failure (``No_Sql.py:257-267``).

The output contract is the same IR dict the rule compiler emits, so the
executor cannot tell which front end produced a query.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import types as T

from nlp_to_nosql_spark.compiler.parse import parse_llm_response
from nlp_to_nosql_spark.compiler.rules import nl_to_ir
from nlp_to_nosql_spark.ir import DEFAULT_LIMIT, QuerySpec

#: Operator rules section, per the reference's template (``No_Sql.py:117-122``).
_RULES = """\
Convert the natural language query into a JSON object with "filter" and
"projection" keys for querying the table described above.
Supported filter operators: $gt, $lt, $gte, $lte, $eq, $ne, $in, $regex.
For case-insensitive text matching use {"$regex": "...", "$options": "i"}.
Projections are inclusion-form: {"field": 1}.
Respond with ONLY the JSON object, no explanations."""

#: Few-shot examples (``No_Sql.py:124-132``), kept schema-generic.
_EXAMPLES = """\
Example 1: "Find all engineering employees"
{"filter": {"department": {"$regex": "engineering", "$options": "i"}}, "projection": {}}
Example 2: "employees earning more than 60000"
{"filter": {"salary": {"$gt": 60000}}, "projection": {}}
Example 3: "names of marketing employees"
{"filter": {"department": {"$regex": "marketing", "$options": "i"}}, "projection": {"name": 1}}"""


def _type_name(dt: T.DataType) -> str:
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "integer"
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return "number"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.DateType, T.TimestampType)):
        return "date"
    return dt.simpleString()


def schema_prompt(schema: T.StructType, table_name: str = "table") -> str:
    """Render a table schema as the prompt's field list."""
    lines = [f'The "{table_name}" table has the following fields:']
    lines += [f"- {f.name} ({_type_name(f.dataType)})" for f in schema.fields]
    return "\n".join(lines)


def build_prompt(nl_text: str, schema: T.StructType, table_name: str = "table") -> str:
    return "\n\n".join(
        [schema_prompt(schema, table_name), _RULES, _EXAMPLES, f'Query: "{nl_text}"']
    )


class LLMCompiler:
    """NL→QuerySpec via an injected completion function, rule fallback."""

    def __init__(self, complete: Callable[[str], str] | None = None):
        self.complete = complete

    def compile_ir(
        self, nl_text: str, schema: T.StructType, table_name: str = "table"
    ) -> dict[str, Any]:
        if self.complete is None:
            return nl_to_ir(nl_text)
        try:
            raw = self.complete(build_prompt(nl_text, schema, table_name))
        except Exception:
            # LLM failure → deterministic fallback (No_Sql.py:257-267)
            return nl_to_ir(nl_text)
        return parse_llm_response(raw, nl_text)

    def compile(
        self,
        nl_text: str,
        schema: T.StructType,
        table_name: str = "table",
        limit: int = DEFAULT_LIMIT,
    ) -> QuerySpec:
        return QuerySpec.from_ir(
            self.compile_ir(nl_text, schema, table_name), limit=limit
        )
