"""Range (interval-containment) join — point-in-interval without a theta join.

``range_join(left, right)`` pairs each left row (a time point) with every
right row whose ``[start, end]`` interval contains it, optionally also
matching equality keys.  Spark would execute the naive formulation
(equi-keys + BETWEEN) as an equi-join with a per-key row fanout — or,
with no equi-keys at all, as a broadcast nested-loop over the whole right
side.  The scale path here is **time bucketing**:

1. each right interval explodes into the fixed-width buckets it covers
   (replication = interval span / bucket width, bounded by construction);
2. each left point computes its single bucket;
3. the join runs on (bucket [+ keys]) — a plain hash shuffle join AQE can
   size and skew-split — followed by the exact BETWEEN filter.

Pick ``bucket_s`` near the typical interval length: too small inflates
right-side replication, too large inflates candidate pairs per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nlp_to_nosql_spark.functions.time import epoch_us


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_start: str,
    right_end: str,
    bucket_s: int = 3600,
    left_keys: list[str] | None = None,
    right_keys: list[str] | None = None,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Inner point-in-interval join (inclusive bounds) on time buckets.

    Returns all left columns plus all right columns; equality keys are
    joined positionally (``left_keys[i] == right_keys[i]``) and the
    right-side key columns are dropped from the output.

    ``max_buckets_per_interval`` is the replication circuit breaker: one
    corrupt or open-ended interval (end = year 2200, a sentinel NULL
    mapped to max-date, …) would otherwise explode into millions of
    bucket rows — or past Spark's array limit — and take down the whole
    job.  An interval wider than the cap raises a clear error at that
    row; widen the cap (or ``bucket_s``) deliberately, not by accident.
    """
    left_keys = left_keys or []
    right_keys = right_keys or []
    if len(left_keys) != len(right_keys):
        raise ValueError("left_keys and right_keys must pair up")

    # Integer FLOOR division: double-divide + cast('long') truncates toward
    # zero, so pre-1970 (negative-micros) points could land one bucket above
    # their containing interval and silently drop a valid match.  epoch_us
    # (not unix_micros) so TIMESTAMP_NTZ time columns work too.
    bucket_us = F.lit(bucket_s * 1_000_000)
    lb = F.floor(epoch_us(F.col(left_time)) / bucket_us)
    rb_first = F.floor(epoch_us(F.col(right_start)) / bucket_us)
    rb_last = F.floor(epoch_us(F.col(right_end)) / bucket_us)

    from nlp_to_nosql_spark.operators.joins import _internal_name

    bucket_col = _internal_name("_bucket", left.columns, right.columns)
    # NULL bounds drop the row (sequence(NULL, ...) → NULL → explode drops),
    # matching asof's NULL-time handling — they must NOT reach the circuit
    # breaker, where a three-valued span_ok would fire raise_error (with a
    # NULL message, since concat of a NULL cast is NULL) and one bad row
    # would kill a 100 TB join.
    bounds_null = rb_first.isNull() | rb_last.isNull()
    span_ok = (rb_last - rb_first) < F.lit(max_buckets_per_interval)
    guarded_last = F.when(bounds_null, F.lit(None).cast("long")).when(
        span_ok, rb_last
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join: interval spans >= {max_buckets_per_interval} "
                    f"buckets of {bucket_s}s (start="
                ),
                F.col(right_start).cast("string"),
                F.lit(", end="),
                F.col(right_end).cast("string"),
                F.lit(") — corrupt data, or raise max_buckets_per_interval/"
                      "bucket_s deliberately"),
            )
        ).cast("long")
    )

    lhs = left.withColumn(bucket_col, lb)
    rhs = right.withColumn(bucket_col, F.explode(F.sequence(rb_first, guarded_last)))

    cond = lhs[bucket_col] == rhs[bucket_col]
    for lk, rk in zip(left_keys, right_keys):
        cond = cond & (lhs[lk] == rhs[rk])
    cond = (
        cond
        & (lhs[left_time] >= rhs[right_start])
        & (lhs[left_time] <= rhs[right_end])
    )

    out_cols = [lhs[c] for c in left.columns] + [
        rhs[c] for c in right.columns if c not in right_keys
    ]
    return lhs.join(rhs, cond).select(*out_cols)
