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
) -> DataFrame:
    """Inner point-in-interval join (inclusive bounds) on time buckets.

    Returns all left columns plus all right columns; equality keys are
    joined positionally (``left_keys[i] == right_keys[i]``) and the
    right-side key columns are dropped from the output.
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

    lhs = left.withColumn("_bucket", lb)
    rhs = right.withColumn("_bucket", F.explode(F.sequence(rb_first, rb_last)))

    cond = lhs["_bucket"] == rhs["_bucket"]
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
