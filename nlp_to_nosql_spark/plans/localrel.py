"""Driver-local DataFrames without the Python-RDD parallelize path.

``spark.createDataFrame(list_of_tuples, schema)`` routes through
``SparkContext.parallelize``: the rows are pickled into
``defaultParallelism`` RDD slices and every downstream action evaluates
them through Python workers — one worker dispatch per slice per action.
Measured on this engine's bench host (local[32], Spark 4.1.2): a ONE-ROW
frame built that way costs ~4.5-5 s per action (32 Python-worker
dispatches just to ship a handful of literals), and the cost recurs on
every job that re-evaluates the plan.  The Arrow route builds a JVM
``LocalRelation`` instead — no Python workers at execution time, ever —
measured ~0.1 s for the same frame, and it behaves like a literal table
under Catalyst (broadcastable, constant-foldable, no BatchEvalPython).

:func:`local_df` is the engine-wide replacement for every
driver-resident small table (tokenizer artifacts, prefix-sum offset
tables, query-term anchors, union-find label maps).  It converts the
rows to a ``pyarrow.Table`` typed exactly by the Spark schema (no pandas
inference in the middle — ``pa.array(..., type=...)`` either produces the
exact declared type or raises), so values and schema are identical to
the parallelize path; any conversion failure falls back to plain
``createDataFrame`` rather than guessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """A DataFrame over driver-local ``rows`` as a JVM LocalRelation.

    ``rows``: iterable of tuples/Rows (scalar cells — the engine's
    driver-resident tables are all flat); ``schema``: DDL string or
    ``StructType``.  Exact-typed via Arrow; falls back to
    ``spark.createDataFrame`` for anything Arrow can't represent.

    TimestampType caveat: the Arrow path types timestamps tz=UTC (naive
    datetimes read as UTC) while the fallback reads them in the session
    zone — the two branches agree because the engine pins its sessions
    to UTC (``session.py``); a non-UTC session would shift fallback
    values by the zone offset.
    """
    st = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    data = [tuple(r) for r in rows]
    # Arity check up front: zip(*data)/zip(cols, schema) silently
    # TRUNCATE over-long rows, where the fallback createDataFrame
    # raises — malformed calls must fail the same way on both paths.
    bad = next((t for t in data if len(t) != len(st.fields)), None)
    if bad is not None:
        raise ValueError(
            f"local_df: row has {len(bad)} fields but schema has "
            f"{len(st.fields)}: {bad!r}"
        )
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        pa_schema = to_arrow_schema(st)
        cols = list(zip(*data)) if data else [[] for _ in st.fields]
        arrays = [
            pa.array(list(c), type=f.type) for c, f in zip(cols, pa_schema)
        ]
        tbl = pa.Table.from_arrays(arrays, schema=pa_schema)
        return spark.createDataFrame(tbl, schema=st)
    except Exception:
        return spark.createDataFrame(data, st)
