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

from nlp_to_nosql_spark.functions.time import epoch_us, micros_to_ntz

#: Supported bucket widths → (micros per bucket, grid-stride interval).
#: All three are FIXED-width in the naive-timestamp domain (a naive day
#: is always 86400 s — DST belongs to zoned time), which is what makes
#: the epoch floor below equal to a naive ``date_trunc``.
_STEPS = {
    "minute": (60 * 1_000_000, "interval 1 minute"),
    "hour": (3_600 * 1_000_000, "interval 1 hour"),
    "day": (86_400 * 1_000_000, "interval 1 day"),
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

    ``unit`` is one of ``minute`` / ``hour`` / ``day``.  The bucket is an
    epoch-microsecond floor re-materialized as ``TIMESTAMP_NTZ`` (via
    :func:`~nlp_to_nosql_spark.functions.time.epoch_us`) — NOT
    ``date_trunc``, which implicitly converts NTZ inputs through the
    session zone and would make the buckets (and the DuckDB naive-
    timestamp oracle) session-timezone-dependent.  For NTZ input the
    bucket equals a naive ``date_trunc`` in every session zone; a
    ``TIMESTAMP`` (with-zone) input is bucketed on its session-local
    wall clock (calendar fields, not its UTC instant) — across a DST
    transition adjacent buckets are not equal-duration.  The engine's
    events table is pinned NTZ upstream, so this path is zone-free in
    practice; pre-convert with ``to_utc_timestamp`` if instant-based
    buckets of an LTZ column are required.

    Keys are densified across the GLOBAL time range, not each key's own
    span: a key silent since Monday still emits zeros on Tuesday, which
    is the semantics monitoring needs.  Keys never seen at all cannot be
    densified (no key dimension exists to enumerate them from); pass a
    pre-joined dimension table instead if absent keys must appear.
    """
    if unit not in _STEPS:
        raise ValueError(f"unit must be one of {sorted(_STEPS)}, got {unit!r}")
    step_us, step_interval = _STEPS[unit]
    step = F.expr(step_interval)

    bucket = micros_to_ntz(
        F.floor(epoch_us(F.col(ts_col)) / F.lit(step_us)).cast("long")
        * F.lit(step_us)
    )
    sparse = df.groupBy(key_col, bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )

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
