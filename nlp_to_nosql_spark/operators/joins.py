"""Join strategy helpers beyond Catalyst's defaults.

``salted_join`` is the classic skew mitigation for keys AQE's skew-join
splitting can't fix (e.g. a shuffle-hash join where one key holds a
double-digit percentage of all rows): spread each hot left key across
``salt`` sub-partitions and replicate the right side to meet them.

Trade-off made explicit: right-side rows are duplicated ``salt`` times,
so this pays |R|·salt shuffle volume to break a hot key into ``salt``
parallel reducers.  Use only when the right side is much smaller than
the skewed left side (the broadcast-threshold failure zone: too big to
broadcast, small enough to replicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join on ``left_on == right_on`` with ``salt``-way key spreading.

    The left side gets a uniform pseudo-random salt (seeded — the plan is
    deterministic per run; the join RESULT is identical for any salt
    assignment); the right side is exploded across all salt values.
    Output columns = all left columns + all right columns except the
    right key.
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    # The right side is replicated `salt` times, so any join type that emits
    # unmatched RIGHT rows would emit each of them `salt` times (duplicate
    # null-extended rows).  Left-preserving types are safe: every right
    # replica meets exactly the left-salt slice it pairs with.
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        raise ValueError(
            f"salted_join does not support how={how!r}: right-preserving "
            "joins would duplicate unmatched right rows salt times"
        )
    lhs = left.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
    rhs = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    cond = (lhs[left_on] == rhs[right_on]) & (lhs["_salt"] == rhs["_salt"])
    out_cols = [lhs[c] for c in left.columns] + [
        rhs[c] for c in right.columns if c != right_on
    ]
    return lhs.join(rhs, cond, how).select(*out_cols)
