"""Timezone-safe epoch arithmetic for timestamp columns of EITHER type.

PySpark 4.1.2 reads the testdata's parquet TIMESTAMP(NANOS) column
natively as ``TIMESTAMP_NTZ`` (and silently ignores
``spark.sql.legacy.parquet.nanosAsLong``); older runtimes surface it as a
long of nanos that the catalog converts.  ``unix_micros`` requires
``TIMESTAMP`` (with-local-timezone) and raises DATATYPE_MISMATCH on NTZ —
this took down ``sessionize``/``range_join`` in round 2.

``epoch_us`` instead measures microseconds from a literal NTZ epoch with
``timestamp_diff``, which accepts both ``TIMESTAMP`` and ``TIMESTAMP_NTZ``
and — for NTZ inputs — is independent of the session timezone, matching
DuckDB's naive-timestamp ``epoch_us()`` exactly.  (For LTZ inputs the
NTZ literal is coerced through the session zone; differences of two
``epoch_us`` values cancel any constant offset, and the engine pins the
canonical events type to NTZ in ``sources.catalog._normalize`` anyway.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Literal naive epoch — comparable to both timestamp types.
_EPOCH_NTZ = "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ)"


def epoch_us(col: Column | str) -> Column:
    """Microseconds since the epoch for a TIMESTAMP or TIMESTAMP_NTZ column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), c)


def micros_to_ntz(us: Column) -> Column:
    """Inverse of :func:`epoch_us`: integer epoch-microseconds → TIMESTAMP_NTZ
    (timezone-independent — no session-zone reinterpretation on the way in)."""
    return F.timestamp_add("MICROSECOND", us, F.expr(_EPOCH_NTZ))
