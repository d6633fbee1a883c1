"""Partitioning helpers.

``fan_out`` fixes the small-file parallelism trap: a few-MB parquet file
arrives as ONE input split (``spark.sql.files.maxPartitionBytes`` /
``openCostInBytes`` floor), so CPU-heavy per-row work (shingling, hashing,
Arrow-batched UDFs) runs on one core of the cluster.  Repartitioning the
narrow input before the expensive projection spreads it across executors.

At the 100 TB design point the input already has thousands of splits and
``fan_out`` is a no-op — the guard compares the actual scan partition
count against the session's default parallelism, so the extra shuffle is
paid only when the input is too small for it to matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism * multiplier`` partitions
    if (and only if) it currently has fewer.

    Use immediately before per-row CPU-heavy transformations whose input
    is narrow (ids + text), never after a wide projection — the shuffle
    moves whatever columns are in ``df``.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
