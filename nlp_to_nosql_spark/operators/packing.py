"""Token-budget packing: assign ordered documents to training batches.

The standard LLM-data step after cleaning/dedup: walk the corpus in a
deterministic order and cut it into batches of ≈ ``budget`` tokens.  The
batch id of a document is a function of the GLOBAL running token count —
the textbook distributed prefix-sum problem, which a naive
``Window.orderBy(...)`` cumsum would serialize into ONE partition (the
classic global-window scale trap).

Scale shape here (two passes, no global window):

1. range-partition by the order key, per-partition cumulative sums via a
   partition-local window (each partition sorts its own slice);
2. per-partition totals — ONE small row per partition — collect to the
   driver, prefix-sum them there (O(#partitions), the same bounded-driver
   contract as broadcast joins), broadcast the offsets back, and add.

The result is independent of the partition count or boundaries: any
range partitioning of the same order yields identical global cumsums.

Batch rule (documented, mirrored by the SQL oracle): a document belongs
to the batch its FIRST token lands in — ``floor(cumsum_exclusive /
budget)`` — so batches are contiguous and a boundary-straddling document
goes to the earlier batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_by_token_budget(
    df: DataFrame,
    order_col: str,
    tokens_col: str,
    budget: int,
    partitions: int | None = None,
) -> DataFrame:
    """Add ``cum_tokens`` (inclusive global running sum ordered by
    ``order_col``) and ``batch_id`` (``floor((cum_tokens - tokens) /
    budget)``) to ``df``.  ``order_col`` must be unique (it defines the
    pack order).

    ``tokens_col`` is any non-negative per-row count — the contract
    queries feed whitespace token counts (``pack1``) and real BPE
    token counts from a fitted tokenizer
    (``selection.bpe_encode_len`` → ``pipe6``, the train-tokenizer →
    count-tokens → pack pipeline)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = df.sparkSession
    if partitions is None:
        try:
            partitions = spark.sparkContext.defaultParallelism
        except Exception:  # Spark Connect
            partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    # Reject null/negative token counts up front: a NULL would poison the
    # window sum into NULL cum/batch ids, and a negative count breaks the
    # max()-as-partition-total invariant below — both silent corruption.
    checked_tokens = F.when(
        F.col(tokens_col).isNotNull() & (F.col(tokens_col) >= 0),
        F.col(tokens_col).cast("long"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"pack_by_token_budget: {tokens_col} must be a "
                      "non-negative non-null count, got "),
                F.col(tokens_col).cast("string"),
            )
        ).cast("long")
    )

    ranged = df.repartitionByRange(partitions, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Pin ONE materialization: repartitionByRange samples its boundaries
    # per job execution, so without this the totals job and the output job
    # could disagree on which partition a boundary row belongs to — wrong
    # offsets, and rows silently dropped by the _pid join for pids the
    # first job never produced.  The totals collect below is the
    # materializing action (eager=False costs no extra job).
    local = ranged.withColumn(
        "_local_cum", F.sum(checked_tokens).over(w)
    ).localCheckpoint(eager=False)

    # One row per partition: (pid, partition total).  Driver-side prefix
    # sum over #partitions rows — bounded by construction.
    totals = (
        local.groupBy("_pid").agg(F.max("_local_cum").alias("_total")).collect()
    )
    offsets, acc = {}, 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_total"]
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )

    out = (
        local.join(F.broadcast(offset_df), "_pid")
        .withColumn("cum_tokens", F.col("_local_cum") + F.col("_offset"))
        .withColumn(
            "batch_id",
            # integer `div`, not double /: cum_tokens past 2^53 would lose
            # exactness in float division and misassign boundary docs.
            F.expr(
                f"(cum_tokens - cast({tokens_col} as bigint)) div {int(budget)}"
            ).cast("long"),
        )
    )
    return out.select(*df.columns, "cum_tokens", "batch_id")


def batch_manifest(packed: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    """Per-batch manifest: doc count, token sum, id span — the unit a
    downstream tokenizer/writer consumes."""
    return packed.groupBy("batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("n_tokens"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )
