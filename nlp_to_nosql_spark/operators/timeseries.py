"""Dense time-series resampling: bucketed rollups with zero-filled gaps.

A raw event stream has no row for an hour in which nothing happened, but
downstream consumers of a rollup (anomaly detectors, dashboards, training
feature windows) need a DENSE series — a missing bucket must read as an
explicit zero, not be silently absent.  The reference engine has no
time-series surface (it is an NL→Mongo translator); this extends the
engine's event-analytics family next to ts1–ts4 (SURVEY §8 extensions).

Scale shape: the sparse rollup is a partial-aggregated groupBy on
(key, bucket); the dense grid is built by exploding one timestamp
``sequence`` per distinct key — grid cardinality is |keys| × |buckets|,
which is tiny relative to the event table (it is the OUTPUT size of the
rollup, not the input size) — and the final left join is keyed on
(key, bucket), so AQE broadcasts the side the statistics justify.  The
global bounds are a single-row aggregate joined by broadcast, never a
driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Supported bucket widths → SQL interval literal for the grid stride.
_STEPS = {
    "minute": "interval 1 minute",
    "hour": "interval 1 hour",
    "day": "interval 1 day",
}


def gapfill_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    unit: str = "hour",
) -> DataFrame:
    """Dense per-key event counts: ``(key, bucket, n_events)`` with one
    row for EVERY (key, bucket) combination between the global first and
    last bucket, zero-filled where the sparse rollup has no row.

    ``unit`` is one of ``minute`` / ``hour`` / ``day`` — both the
    ``date_trunc`` bucket and the grid stride.  Works on ``TIMESTAMP``
    and ``TIMESTAMP_NTZ`` alike (``date_trunc`` and ``sequence`` are
    type-preserving; no epoch math, so no session-zone sensitivity).

    Keys are densified across the GLOBAL time range, not each key's own
    span: a key silent since Monday still emits zeros on Tuesday, which
    is the semantics monitoring needs.  Keys never seen at all cannot be
    densified (no key dimension exists to enumerate them from); pass a
    pre-joined dimension table instead if absent keys must appear.
    """
    if unit not in _STEPS:
        raise ValueError(f"unit must be one of {sorted(_STEPS)}, got {unit!r}")
    step = F.expr(_STEPS[unit])

    sparse = df.groupBy(
        key_col, F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))

    bounds = sparse.agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    grid = (
        sparse.select(key_col)
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias(
                "bucket"
            ),
        )
    )
    return grid.join(sparse, [key_col, "bucket"], "left").select(
        key_col,
        "bucket",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )


#: DuckDB twin over ``events`` grouped by ``event_type`` — format with
#: ``unit`` (e.g. ``hour``).  ``generate_series`` is inclusive of both
#: bounds, exactly like Spark's ``sequence``.
GAPFILL_SQL = (
    "WITH sparse AS (SELECT event_type, date_trunc('{unit}', ts) AS bucket, "
    "CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY 1, 2), "
    "b AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM sparse), "
    "grid AS (SELECT event_type, unnest(generate_series(lo, hi, "
    "INTERVAL 1 {unit})) AS bucket "
    "FROM (SELECT DISTINCT event_type FROM sparse), b) "
    "SELECT grid.event_type, grid.bucket, "
    "COALESCE(n_events, 0) AS n_events "
    "FROM grid LEFT JOIN sparse USING (event_type, bucket)"
)
