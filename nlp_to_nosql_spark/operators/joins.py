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

    The left salt is a DETERMINISTIC row hash (``seed`` mixes into it):
    task retries and stage recomputation re-derive the identical salt per
    row, which a ``rand()`` salt does not guarantee (a recomputed map task
    can re-draw, losing or duplicating matches).  The hash covers the join
    key plus every hashable column — MapType columns (which hash
    expressions reject outright) are the only exclusion, since without
    cardinality statistics any narrower subset risks hashing only
    constants under the hot key and collapsing the salt.  Rows identical
    in the hashed columns share a salt — acceptable residual skew, since
    the pathology salting targets is many DISTINCT rows under one hot
    key.
    The right side is exploded across all salt values; the join RESULT is
    identical for any salt assignment.  Output columns = all left columns
    + all right columns except the right key (semi/anti: left columns
    only, per Spark's own semantics).
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
    salt_col = _internal_name("_salt", left.columns, right.columns)
    lhs = left.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(
                F.lit(seed),
                *[F.col(c) for c in _salt_hash_cols(left, left_on)],
            ),
            F.lit(salt),
        ).cast("int"),
    )
    rhs = right.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    cond = (lhs[left_on] == rhs[right_on]) & (lhs[salt_col] == rhs[salt_col])
    joined = lhs.join(rhs, cond, how)
    if how in ("left_semi", "leftsemi", "left_anti", "leftanti"):
        # Semi/anti output carries only the left side.
        return joined.select(*[lhs[c] for c in left.columns])
    out_cols = [lhs[c] for c in left.columns] + [
        rhs[c] for c in right.columns if c != right_on
    ]
    return joined.select(*out_cols)


def _salt_hash_cols(df: DataFrame, key: str) -> list[str]:
    """Join key + every hashable disambiguator column.

    Hash expressions reject MapType (anywhere in a nested type), so those
    columns are skipped — that is the only exclusion.  Salting has no
    cardinality statistics, so dropping any OTHER column risks hashing
    only constants under the hot key (e.g. a few enum flags) and
    collapsing every hot-key row into one salt bucket — the exact skew
    this operator exists to break.  Hashing a wide text column costs a
    few ns/row more than an int; a collapsed salt costs the whole join.
    Selection is deterministic (schema order) — retries re-derive
    identical salts.
    """
    from pyspark.sql import types as T

    def hashable(dt) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return hashable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(hashable(f.dataType) for f in dt.fields)
        return True

    return [key] + [
        f.name
        for f in df.schema.fields
        if f.name != key and hashable(f.dataType)
    ]


def _internal_name(base: str, *column_sets: list[str]) -> str:
    """A helper-column name guaranteed absent from every input — a user
    column literally named ``_salt``/``_bucket`` must not be silently
    overwritten (withColumn replaces in place)."""
    taken = {c for cols in column_sets for c in cols}
    name = base
    while name in taken:
        name = "_" + name
    return name
