"""As-of (nearest-prior) join — an operator Spark's DataFrame API lacks.

For each left row, attach the right row with the greatest right-time ≤
left-time for the same key (the "backward" as-of of pandas
``merge_asof`` / DuckDB ``ASOF JOIN``, which is the oracle we check
against).

Formulation: **union + ordered window carry-forward**, not a range join —

1. tag right rows side=0, left rows side=1, align on (key, t, side);
2. one hash shuffle on the key, one in-partition sort by (t, side);
3. ``last(value, ignorenulls=True)`` over rows-unbounded-preceding carries
   each right value forward to every later left row;
4. keep side=1 rows.

Cost: one shuffle of |L|+|R| narrow rows and one sort — versus the
O(|L|·matches) blowup of the naive range-join-then-pick-latest.  Ties at
equal time resolve inclusively (right side sorts first).  The right side
must be unique per (key, time) — pre-aggregate duplicates first or the
carried value is nondeterministic.

Skew note (100 TB): a hot key serializes into one window partition.
:func:`asof_join_bucketed` is the mitigation — window within (key,
time_bucket) so a hot key spreads over many partitions, then a second
*sparse* pass (one row per (key, bucket)) carries each bucket's last
right value into later buckets.  Result is identical to
:func:`asof_join` for any bucket size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nlp_to_nosql_spark.functions.time import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of join; returns all left columns plus ``value_cols``
    (null where the key has no right row at or before the left time, or
    the match is older than ``tolerance_s`` seconds)."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (right_on, right_time)]
    left_cols = left.columns
    right = _checked_right(right, right_time, value_cols, left_cols)

    rhs = right.select(
        F.col(right_on).alias("_key"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_time).alias("_rt"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    lhs = left.select(
        F.col(left_on).alias("_key"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_time].dataType).alias("_rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c) for c in left_cols],
    )

    w = Window.partitionBy("_key").orderBy("_t", "_side").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # Carry the whole right row as ONE struct (null on left rows): carrying
    # columns independently would stitch together values from different
    # right rows when a newer right row holds a legitimate NULL.
    right_struct = F.when(
        F.col("_side") == 0,
        F.struct(F.col("_rt").alias("_rt"), *[F.col(c) for c in value_cols]),
    )
    carried = rhs.unionByName(lhs).select(
        "_side",
        *left_cols,
        F.last(right_struct, ignorenulls=True).over(w).alias("_r"),
    ).select(
        "_side",
        *left_cols,
        F.col("_r._rt").alias("_matched_t"),
        *[F.col(f"_r.{c}").alias(c) for c in value_cols],
    )

    out = carried.filter(F.col("_side") == 1)
    return _finish(out, left_cols, value_cols, left_time, tolerance_s)


def _checked_right(
    right: DataFrame,
    right_time: str,
    value_cols: list[str],
    left_cols: list[str],
) -> DataFrame:
    """Shared preconditions of both as-of variants.

    * A right row with a NULL time has no place on the time axis; left
      unguarded it sorts NULLS FIRST and becomes a universal "match" for
      every pre-first-match left row.  DuckDB ASOF / pandas merge_asof
      treat NULL keys as matching nothing — drop them.
    * A value column sharing a name with a left column would collide in
      the union-align projection (and in the output schema); fail fast
      with the remedy instead of an opaque COLUMN_ALREADY_EXISTS.
    """
    clash = sorted(set(value_cols) & set(left_cols))
    if clash:
        raise ValueError(
            f"as-of value_cols {clash} collide with left columns; rename "
            "them on the right side (e.g. .withColumnRenamed) or pass "
            "disjoint value_cols"
        )
    return right.filter(F.col(right_time).isNotNull())


def _finish(
    out: DataFrame,
    left_cols: list[str],
    value_cols: list[str],
    left_time: str,
    tolerance_s: int | None,
) -> DataFrame:
    if tolerance_s is not None:
        in_tol: Column = (
            epoch_us(F.col(left_time)) - epoch_us(F.col("_matched_t"))
            <= tolerance_s * 1_000_000
        )
        return out.select(
            *left_cols,
            *[
                F.when(in_tol, F.col(c)).otherwise(F.lit(None)).alias(c)
                for c in value_cols
            ],
        )
    return out.select(*left_cols, *value_cols)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    tolerance_s: int | None = None,
    bucket: str = "1 day",
) -> DataFrame:
    """Skew-safe as-of join: identical semantics to :func:`asof_join`, but
    the carry-forward window runs within ``(key, time_bucket)`` so a hot
    key parallelizes across its time range instead of serializing into one
    window partition.

    Two-phase plan:

    1. *Dense pass* — union + carry-forward exactly like :func:`asof_join`,
       but partitioned by ``(key, bucket)``: each left row picks up the
       latest right row **within its own bucket**.
    2. *Sparse pass* — one summary row per (key, bucket) holding that
       bucket's last right value; a window over ``key`` ordered by
       ``(bucket, marker)`` (left markers sort before right summaries of
       the same bucket) carries the latest summary from **strictly
       earlier** buckets to every left bucket.  This table is |keys|·
       |buckets| at most — orders of magnitude smaller than the data, so
       its key-partitioned window can't be a skew bottleneck.

    Left rows whose bucket has no earlier in-bucket right row coalesce to
    the sparse fill.  Choose ``bucket`` so a hot key's rows spread over
    many buckets (e.g. daily buckets over a year of ticks → 365-way
    parallelism for the hottest symbol).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (right_on, right_time)]
    left_cols = left.columns
    right = _checked_right(right, right_time, value_cols, left_cols)
    bucket_col = lambda t: F.window(F.col(t), bucket)["start"]  # noqa: E731

    rhs = right.select(
        F.col(right_on).alias("_key"),
        F.col(right_time).alias("_t"),
        bucket_col(right_time).alias("_b"),
        F.lit(0).alias("_side"),
        F.col(right_time).alias("_rt"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    lhs = left.select(
        F.col(left_on).alias("_key"),
        F.col(left_time).alias("_t"),
        bucket_col(left_time).alias("_b"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[right_time].dataType).alias("_rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c) for c in left_cols],
    )

    right_struct = F.when(
        F.col("_side") == 0,
        F.struct(F.col("_rt").alias("_rt"), *[F.col(c) for c in value_cols]),
    )

    # Phase 1: within-bucket carry (the hot-key shuffle, now spread over
    # (key, bucket) instead of key alone).
    w1 = Window.partitionBy("_key", "_b").orderBy("_t", "_side").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dense = (
        rhs.unionByName(lhs)
        .select(
            "_side",
            "_key",
            "_b",
            *left_cols,
            F.last(right_struct, ignorenulls=True).over(w1).alias("_r"),
        )
        .filter(F.col("_side") == 1)
    )

    # Phase 2: sparse per-(key, bucket) summaries → latest summary from
    # strictly earlier buckets, delivered to every left bucket.
    summaries = (
        rhs.groupBy("_key", "_b")
        .agg(F.max_by(right_struct, F.col("_t")).alias("_s"))
        .select("_key", "_b", F.lit(1).alias("_m"), F.col("_s"))
    )
    markers = (
        lhs.select("_key", "_b")
        .distinct()
        .select(
            "_key", "_b", F.lit(0).alias("_m"),
            F.lit(None).cast(summaries.schema["_s"].dataType).alias("_s"),
        )
    )
    w2 = Window.partitionBy("_key").orderBy("_b", "_m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fill = (
        summaries.unionByName(markers)
        .select(
            "_key", "_b", "_m",
            F.last(F.col("_s"), ignorenulls=True).over(w2).alias("_prev"),
        )
        .filter(F.col("_m") == 0)
        .select("_key", "_b", "_prev")
    )

    best = F.coalesce(F.col("_r"), F.col("_prev"))
    out = (
        dense.join(fill, ["_key", "_b"], "left")
        .select(
            *left_cols,
            best["_rt"].alias("_matched_t"),
            *[best[c].alias(c) for c in value_cols],
        )
    )
    return _finish(out, left_cols, value_cols, left_time, tolerance_s)
