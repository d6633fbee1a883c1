"""Vector math over ``array<float>`` columns — pure Column expressions.

``F.zip_with`` / ``F.aggregate`` keep the arithmetic JVM-side (no Python
row transfer); at 100 TB this is the difference between a codegen'd scan
and an Arrow round-trip per batch.  All math is done in double precision.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_vector(values: Sequence[float]) -> Column:
    """A literal array<double> column (e.g. the ANN query vector)."""
    return F.array(*[F.lit(float(v)) for v in values])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


#: DuckDB twins ({a}/{b} are list columns).  list_cosine_similarity computes
#: in double like we do; the CASE mirrors cosine()'s zero-norm → 0.0 guard
#: (DuckDB would divide by zero instead).
DOT_SQL = "list_dot_product({a}, {b})"
COSINE_SQL = (
    "CASE WHEN list_dot_product({a}, {a}) = 0 "
    "OR list_dot_product({b}, {b}) = 0 THEN 0.0 "
    "ELSE list_cosine_similarity({a}, {b}) END"
)
