"""Query IR — the single intermediate representation of the engine.

The reference's IR is a plain dict ``{"filter": <pred tree>, "projection":
<col map>}`` (produced at ``No_Sql.py:255,302``, validated at
``No_Sql.py:304-314``, consumed at ``No_Sql.py:395-397``).  We keep the exact
same predicate-tree shape so the reference's golden NL→IR pairs transfer
verbatim, but wrap it in a typed dataclass with the executor-side knobs
(limit clamp per ``No_Sql.py:397``) made explicit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

#: Complete predicate vocabulary the compiler may emit (``No_Sql.py:119-120``).
SUPPORTED_OPERATORS = frozenset(
    {"$gt", "$lt", "$gte", "$lte", "$eq", "$ne", "$in", "$regex", "$options"}
)

#: Limit clamp bounds (``No_Sql.py:397``; API bound ``app_server.py:78``).
MIN_LIMIT = 1
MAX_LIMIT = 1000
DEFAULT_LIMIT = 50


def clamp_limit(limit: int) -> int:
    """Clamp a requested row limit to [1, 1000] (``No_Sql.py:397``)."""
    return max(MIN_LIMIT, min(int(limit), MAX_LIMIT))


@dataclass(frozen=True)
class QuerySpec:
    """A validated query: Mongo-shaped filter tree + projection + limit.

    ``filter`` keys are column names; values are either a bare literal
    (implicit equality, ``No_Sql.py:331``) or an operator map like
    ``{"$gt": 60000}``.  Top-level keys AND together; multiple operators
    under one field also AND (Mongo ``find`` semantics of the IR at
    ``No_Sql.py:395,404``).

    ``projection`` is the inclusion list of column names (the reference's
    ``{"name": 1}`` form, ``No_Sql.py:132,363``); empty means select-all
    (``No_Sql.py:311-312,396``).
    """

    filter: Mapping[str, Any] = field(default_factory=dict)
    projection: tuple[str, ...] = ()
    limit: int = DEFAULT_LIMIT

    def __post_init__(self) -> None:
        object.__setattr__(self, "limit", clamp_limit(self.limit))

    @classmethod
    def from_ir(cls, obj: Any, limit: int = DEFAULT_LIMIT) -> "QuerySpec":
        """Build from a raw IR dict, applying the reference's structural
        validation (non-dict → empty query; missing keys injected —
        ``No_Sql.py:304-314``; inclusion-form projection normalized).
        """
        if not isinstance(obj, Mapping):
            return cls(filter={}, projection=(), limit=limit)
        raw_filter = obj.get("filter")
        if not isinstance(raw_filter, Mapping):
            raw_filter = {}
        raw_proj = obj.get("projection")
        projection: tuple[str, ...] = ()
        if isinstance(raw_proj, Mapping):
            # Inclusion form only ({"f": 1}); exclusion is never emitted
            # by the reference (SURVEY §2.3) — truthy values include.
            projection = tuple(k for k, v in raw_proj.items() if v)
        elif isinstance(raw_proj, (list, tuple)):
            projection = tuple(str(c) for c in raw_proj)
        return cls(filter=dict(raw_filter), projection=projection, limit=limit)

    def to_ir(self) -> dict[str, Any]:
        """Round-trip back to the reference's dict IR shape."""
        return {
            "filter": dict(self.filter),
            "projection": {c: 1 for c in self.projection},
        }
