"""Z-order (Morton) data layout — multi-dimensional clustering for
data skipping.

At 100 TB, scan cost is dominated by how many files a filter can SKIP.
Parquet min/max footer stats prune perfectly when the data is sorted by
the filtered column — but a sort on ``(a)`` destroys locality on
``(b)``.  Interleaving the bits of both keys (the Z-order curve, the
same layout Delta/Iceberg ``OPTIMIZE ZORDER BY`` writes) gives every
file a small min/max *rectangle* in (a, b) space, so filters on EITHER
column prune most files.

Everything here is exact BIGINT bit arithmetic — one projection, no
shuffle for the key itself — so the whole layout carries a value-level
DuckDB oracle.  The actual rewrite (:func:`zorder_repartition`) is a
``repartitionByRange`` on the key (one range-exchange, Spark samples
boundaries) + ``sortWithinPartitions`` — the standard write pattern: no
global sort barrier, each output file is a compact Z-range.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each non-negative integer
    column into one BIGINT Morton key.

    Bit ``i`` of dimension ``d`` lands at position ``i·n + d`` (n =
    number of dimensions), so ``n·bits`` must stay ≤ 63.  Inputs are
    masked to ``bits`` bits first — callers map their values into
    [0, 2^bits) (mod, bucketize, or day-offset) for a meaningful curve;
    the mask only guarantees the key is well-defined beyond that range.
    A NULL in any dimension yields a NULL key (sorts first — NULL rows
    cluster together, which is what a layout pass wants).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a BIGINT")
    mask = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        x = c.cast("long").bitwiseAND(F.lit(mask))
        for i in range(bits):
            z = z + F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(
                1 << (i * n + d)
            )
    return z


def zorder_sql_expr(cols: Sequence[str], bits: int = 16) -> str:
    """The identical arithmetic as a DuckDB/ANSI SQL expression string
    (``&``, ``>>``, integer multiply-add) — generated from the same
    loop so the two engines cannot drift."""
    n = len(cols)
    mask = (1 << bits) - 1
    terms = []
    for d, c in enumerate(cols):
        x = f"(CAST({c} AS BIGINT) & {mask})"
        for i in range(bits):
            terms.append(f"(({x} >> {i}) & 1) * {1 << (i * n + d)}")
    return "(" + " + ".join(terms) + ")"


def zorder_profile(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    bucket_bits: int = 6,
) -> DataFrame:
    """Clustering profile of a Z-order layout: assign every row to one
    of ``2^bucket_bits`` Z-ranges (the files an ``OPTIMIZE ZORDER``
    write would cut) and report each range's row count and per-dimension
    min/max — the exact min/max a parquet footer would carry, i.e. the
    skipping power of the layout, as data.

    One projection + one partially-aggregated groupBy on the bucket id.
    Output: ``(zbucket, n_rows, min_<c>/max_<c> per dimension)``, all
    BIGINT.
    """
    n = len(cols)
    shift = n * bits - bucket_bits
    zb = F.shiftright(
        zorder_key([F.col(c) for c in cols], bits), shift
    ).alias("zbucket")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"max_{c}"))
    return df.select(zb, *cols).groupBy("zbucket").agg(*aggs)


def zorder_profile_sql(
    table: str,
    cols: Sequence[str],
    bits: int = 16,
    bucket_bits: int = 6,
) -> str:
    """DuckDB twin of :func:`zorder_profile` built on
    :func:`zorder_sql_expr`."""
    n = len(cols)
    shift = n * bits - bucket_bits
    z = zorder_sql_expr(cols, bits)
    mins = ", ".join(
        f"CAST(MIN({c}) AS BIGINT) AS min_{c}, "
        f"CAST(MAX({c}) AS BIGINT) AS max_{c}"
        for c in cols
    )
    return (
        f"SELECT ({z} >> {shift}) AS zbucket, "
        f"CAST(COUNT(*) AS BIGINT) AS n_rows, {mins} "
        f"FROM {table} GROUP BY 1"
    )


def zorder_repartition(
    df: DataFrame,
    cols: Sequence[str],
    num_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Physically lay out ``df`` along the Z-curve: range-partition on
    the Morton key (Spark samples split points — no global sort) and
    sort within each partition, so every output file covers one compact
    Z-range.  Write the result with ``.write.parquet`` and min/max
    footer stats prune on all ``cols`` at once.  The key column is
    dropped from the output — layout is a physical property.
    """
    keyed = df.withColumn("_zkey", zorder_key([F.col(c) for c in cols], bits))
    return (
        keyed.repartitionByRange(num_partitions, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
