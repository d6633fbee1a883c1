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

Skew note (100 TB): a hot key serializes into one window partition.  The
standard mitigation is time-bucketed salting — window within (key,
time_bucket), then a second sparse pass carrying each bucket's last value
into the next bucket; not needed at driver scales, documented here as the
scale-out path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
    if tolerance_s is not None:
        in_tol: Column = (
            F.unix_micros(F.col(left_time)) - F.unix_micros(F.col("_matched_t"))
            <= tolerance_s * 1_000_000
        )
        out = out.select(
            *left_cols,
            *[
                F.when(in_tol, F.col(c)).otherwise(F.lit(None)).alias(c)
                for c in value_cols
            ],
        )
    else:
        out = out.select(*left_cols, *value_cols)
    return out
