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


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    percentiles: Sequence[int] = (25, 50, 75, 90, 99),
    group_col: str | None = None,
) -> DataFrame:
    """Exact (not approximate) percentiles of an integer-domain metric,
    optionally per group — the profiling signal that sets chunk sizes,
    length filters, and packing targets from the ACTUAL corpus length
    distribution rather than ``approx_percentile``'s error band.

    Semantics are SQL ``percentile_disc``: for percentile ``p`` the
    result is the smallest value whose at-or-below row count reaches
    ``p %`` of the (non-NULL) total — pure BIGINT comparisons
    (``cum * 100 >= p * n``), so the DuckDB twin is value-exact.

    Scale shape: this is NOT a sort of the corpus.  Rows collapse to a
    per-value histogram first (one shuffle whose size is the number of
    DISTINCT values — bounded by the metric's domain, e.g. plausible
    character counts, NOT by corpus row count), and the cumulative
    window then runs over that domain-bounded table.  With
    ``group_col`` the window partitions by group; the global form is a
    single-partition window over the histogram only — safe because the
    domain, not the data, bounds it.  Exactness per 100 TB: the same
    histogram trick Spark's own ``percentile`` UDAF can't use (its
    buffer holds raw values).
    """
    from pyspark.sql import Window

    pcts = [int(p) for p in percentiles]
    if not pcts or any(p < 1 or p > 100 for p in pcts):
        raise ValueError("percentiles must be integers in [1, 100]")
    keys = [group_col] if group_col else []
    v = F.col(value_col)
    hist = (
        df.where(v.isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
    cum_w = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy(*keys)
    cum = hist.select(
        *keys,
        value_col,
        F.sum("_cnt").over(cum_w).cast("long").alias("_cle"),
        F.sum("_cnt").over(tot_w).cast("long").alias("_n"),
    )
    return (
        cum.select(
            *keys,
            value_col,
            "_cle",
            "_n",
            F.explode(F.array(*[F.lit(p) for p in pcts])).alias("pct"),
        )
        .where(
            F.col("_cle") * F.lit(100)
            >= F.col("pct").cast("long") * F.col("_n")
        )
        .groupBy(*keys, "pct")
        .agg(F.min(value_col).alias("value"))
    )


def exact_quantiles_sql(
    table: str = "documents",
    value_col: str = "n_chars",
    percentiles: Sequence[int] = (25, 50, 75, 90, 99),
    group_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`exact_quantiles` — same histogram, same
    cumulative frame, same BIGINT percentile-disc comparison."""
    pcts = ", ".join(str(int(p)) for p in percentiles)
    grp = f"{group_col}, " if group_col else ""
    part = f"PARTITION BY {group_col} " if group_col else ""
    return (
        f"WITH hist AS (SELECT {grp}{value_col} AS value, "
        f"CAST(COUNT(*) AS BIGINT) AS cnt FROM {table} "
        f"WHERE {value_col} IS NOT NULL GROUP BY ALL), "
        f"cum AS (SELECT {grp}value, "
        f"CAST(SUM(cnt) OVER ({part}ORDER BY value "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        f"AS cle, CAST(SUM(cnt) OVER ({part.strip()}) AS BIGINT) AS n "
        f"FROM hist) "
        f"SELECT {grp}p.pct, MIN(value) AS value "
        f"FROM cum CROSS JOIN (SELECT UNNEST([{pcts}]) AS pct) AS p "
        f"WHERE cle * 100 >= p.pct * n GROUP BY ALL"
    )
