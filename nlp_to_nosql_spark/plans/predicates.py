"""Mongo-shaped predicate tree → Spark ``Column``.

Implements the complete predicate vocabulary the reference emits
(``No_Sql.py:119-120``; SURVEY §2.2 P1-P11) with documented Mongo-semantics
choices (SURVEY §7.4):

* top-level filter keys AND together; multiple operators under one field AND;
* a bare scalar value is implicit equality (``No_Sql.py:331``);
* ``$ne`` also matches null/missing values (Mongo: "not equal" includes
  documents where the field is absent) → ``(col != v) | col.isNull()``;
* equality against ``null`` matches null values → ``col.isNull()``;
* ``$in`` containing ``null`` matches nulls too;
* ``$regex`` is an unanchored substring match; ``$options: "i"`` prepends
  ``(?i)`` (``No_Sql.py:120,359``) — plain-literal patterns, so the
  PCRE-vs-Java dialect gap is immaterial (SURVEY §7.4.2);
* a filter on a column absent from the schema compiles against a NULL
  literal, which reproduces Mongo's missing-field semantics exactly for
  this vocabulary: positive operators ($gt/$eq/value/$regex/$in) match
  nothing, while the null-aware negatives match everything ($ne v,
  {field: null}, $eq null, $in [... null]) — SURVEY §4 caveat.

These are plain ``Column`` expressions — Catalyst pushes every one of them
into the parquet scan (verified via ``PushedFilters`` in ``.explain``).
"""

from __future__ import annotations

import logging
from functools import reduce
from operator import and_
from typing import Any, Iterable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from nlp_to_nosql_spark.ir import SUPPORTED_OPERATORS

logger = logging.getLogger(__name__)

#: Derived from the single declared vocabulary (ir.SUPPORTED_OPERATORS)
#: so the IR layer and the compiler can never disagree; $options is
#: consumed alongside $regex rather than compiled on its own.
_COMPARISONS = SUPPORTED_OPERATORS - {"$options"}


class UnsupportedOperatorError(ValueError):
    """Raised for an operator outside the declared vocabulary."""


def _regex_pattern(ops: Mapping[str, Any]) -> str:
    pattern = str(ops["$regex"])
    options = str(ops.get("$options", ""))
    if "i" in options.lower():
        pattern = "(?i)" + pattern
    return pattern


def _field_predicate(field: str, value: Any, col: Column | None = None) -> Column:
    """Predicate for one filter entry: bare literal or operator map.

    ``col`` overrides the column expression — ``compile_predicate`` passes
    a NULL literal for unknown fields, which makes every operator branch
    below evaluate exactly as Mongo does on a missing field (the null-
    aware branches match, the rest yield NULL → filtered out)."""
    if col is None:
        col = F.col(field)

    if not isinstance(value, Mapping):
        # Implicit equality (P6, No_Sql.py:331); null literal matches nulls.
        return col.isNull() if value is None else (col == F.lit(value))

    preds: list[Column] = []
    for op, operand in value.items():
        if op == "$options":
            continue  # consumed alongside $regex
        if op not in _COMPARISONS:
            raise UnsupportedOperatorError(
                f"operator {op!r} on field {field!r} is outside the declared "
                f"vocabulary (No_Sql.py:119-120)"
            )
        if op == "$gt":
            preds.append(col > F.lit(operand))
        elif op == "$lt":
            preds.append(col < F.lit(operand))
        elif op == "$gte":
            preds.append(col >= F.lit(operand))
        elif op == "$lte":
            preds.append(col <= F.lit(operand))
        elif op == "$eq":
            preds.append(col.isNull() if operand is None else (col == F.lit(operand)))
        elif op == "$ne":
            # Mongo $ne matches null/missing too (SURVEY §2.2 P7).
            if operand is None:
                preds.append(col.isNotNull())
            else:
                preds.append((col != F.lit(operand)) | col.isNull())
        elif op == "$in":
            vals = list(operand) if isinstance(operand, Iterable) and not isinstance(operand, (str, bytes)) else [operand]
            non_null = [v for v in vals if v is not None]
            pred = col.isin(*non_null) if non_null else F.lit(False)
            if any(v is None for v in vals):
                pred = pred | col.isNull()
            preds.append(pred)
        elif op == "$regex":
            preds.append(col.rlike(_regex_pattern(value)))

    if not preds:
        # Operator map with only $options (degenerate) → match-all for field.
        return F.lit(True)
    return reduce(and_, preds)


def compile_predicate(
    filter_tree: Mapping[str, Any],
    schema_fields: Iterable[str] | None = None,
) -> Column | None:
    """Compile a full filter tree to one ``Column`` predicate.

    Returns ``None`` for the empty filter (match-all, P10 —
    ``No_Sql.py:377``) so callers can skip the ``.filter`` node entirely.

    When ``schema_fields`` is given, a predicate on an unknown field is
    compiled against a NULL literal with a warning rather than raising an
    AnalysisException — reproducing Mongo's missing-field behavior for
    every operator: positive predicates match nothing, the null-aware
    negatives ($ne v, equality with null, $in containing null) match all
    rows (SURVEY §4).
    """
    if not filter_tree:
        return None
    known = set(schema_fields) if schema_fields is not None else None
    preds: list[Column] = []
    for field, value in filter_tree.items():
        if known is not None and field not in known:
            logger.warning(
                "filter references unknown column %r — compiling against NULL "
                "(Mongo missing-field semantics)", field
            )
            preds.append(_field_predicate(field, value, col=F.lit(None)))
            continue
        preds.append(_field_predicate(field, value))
    return reduce(and_, preds)
