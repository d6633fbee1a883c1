"""Row-level functions for large-scale text/vector pipelines.

All hot-path functions are built-in Column expressions (JVM-side, inside
whole-stage codegen) — no Python UDFs.  Where a function participates in
the DuckDB correctness oracle, the module also exports the equivalent
DuckDB SQL snippet so the two can never drift.
"""

from nlp_to_nosql_spark.functions import text, vectors

__all__ = ["text", "vectors"]
