"""Event-sequence analytics: conversion funnels and cohort retention.

The two workhorse product-analytics operators over an event stream —
"how far does each user get through view → click → purchase?" and "of
the users who arrived in week W, how many were still active in week
W+k?".  Neither exists as a Spark builtin; both compose from windows
and aggregates without any per-row Python.

Scale design:

* :func:`funnel_stages` is a chain of per-user window MINs, each
  conditioned on the previous stage's timestamp.  All windows share the
  same ``partitionBy(user)`` with no ordering, so Catalyst plans ONE
  hash exchange and stacks the Window nodes on it; the final groupBy
  reuses the same partitioning.  State per user is O(#stages).
* :func:`cohort_retention` is two aggregates and one co-partitioned
  join, all keyed on the user id — the first-seen aggregate's shuffle
  partitioning is reused by the join (no second shuffle of the event
  table under AQE), and week arithmetic is EXACT integer division on
  calendar-field epoch microseconds (``functions.time.epoch_us``), so
  the output is zone-free integers the DuckDB twin reproduces
  bit-for-bit (``div`` here = ``//`` there).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nlp_to_nosql_spark.functions.time import epoch_us

WEEK_US = 7 * 86_400_000_000


def funnel_stages(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    stages: Sequence[str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Per-user ordered-funnel timestamps: for each user, the earliest
    ``stages[0]`` event, then the earliest ``stages[1]`` event STRICTLY
    after it, and so on — the ordered-conversion semantics (a purchase
    before any view does not count as conversion).

    Output: one row per user with one ``<stage>_ts`` column per stage
    (NULL once the chain breaks) and ``funnel_stage`` = number of stages
    reached (0..len(stages)).  Ties at equal timestamps do not advance
    the funnel (strict ``>``), identically in the SQL twin.
    """
    w = Window.partitionBy(user_col)
    out = df.select(user_col, type_col, ts_col)
    prev = None
    names = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        name = f"{stage}_ts"
        out = out.withColumn(
            name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = name
        names.append(name)
    # wrap outward from stage 1 so the DEEPEST reached stage tests first
    stage_expr = F.lit(0)
    for i in range(len(names)):
        stage_expr = F.when(
            F.col(names[i]).isNotNull(), F.lit(i + 1)
        ).otherwise(stage_expr)
    return (
        out.groupBy(user_col)
        .agg(
            *[F.max(n).alias(n) for n in names],
        )
        .select(
            user_col,
            *names,
            stage_expr.cast("int").alias("funnel_stage"),
        )
    )


def funnel_sql(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    stages: Sequence[str] = ("view", "click", "purchase"),
) -> str:
    """DuckDB twin of :func:`funnel_stages` — identical chained
    conditional window MINs and strict-inequality advance."""
    ctes = []
    prev_src = table
    prev_col = None
    for i, stage in enumerate(stages):
        cond = f"{type_col} = '{stage}'"
        if prev_col is not None:
            cond += f" AND {ts_col} > {prev_col}"
        name = f"{stage}_ts"
        ctes.append(
            f"e{i} AS (SELECT *, MIN(CASE WHEN {cond} THEN {ts_col} END) "
            f"OVER (PARTITION BY {user_col}) AS {name} FROM {prev_src})"
        )
        prev_src = f"e{i}"
        prev_col = name
    names = [f"{s}_ts" for s in stages]
    case = "CASE "
    for i in range(len(names) - 1, -1, -1):
        case += f"WHEN MAX({names[i]}) IS NOT NULL THEN {i + 1} "
    case += "ELSE 0 END"
    sel = ", ".join(f"MAX({n}) AS {n}" for n in names)
    return (
        "WITH " + ", ".join(ctes) + f" SELECT {user_col}, {sel}, "
        f"CAST({case} AS INT) AS funnel_stage "
        f"FROM {prev_src} GROUP BY {user_col}"
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    every adjacent pair of events per user (ordered by time, ties by
    the unique id), count ``src_type → dst_type`` and attach the
    transition probability — the "what do users do next" matrix that
    drives next-event prediction features and funnel design.

    ``p_micro = floor((n_trans / n_src)·1e6)`` divides BEFORE scaling
    (one IEEE divide/multiply/floor, identical association in the twin),
    so it is engine-exact and cannot overflow at any corpus size.

    NULL types: a NULL ``dst_type`` is indistinguishable from
    ``lead()``'s end-of-chain NULL and is filtered with it, and a NULL
    ``src_type`` cannot match its marginal row in the equi-join — both
    engines drop both identically (tests/test_adversarial_edges.py).

    Plan: one window shuffle on the user (lead), then a
    transition-matrix-sized groupBy (|types|² keys) and its re-aggregated
    row marginal joined back — both tiny; the event table shuffles once.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    pairs = (
        df.select(
            F.col(type_col).alias("src_type"),
            F.lead(type_col).over(w).alias("dst_type"),
        )
        .filter(F.col("dst_type").isNotNull())
    )
    counts = pairs.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans")
    )
    totals = counts.groupBy("src_type").agg(
        F.sum("n_trans").cast("long").alias("n_src")
    )
    return counts.join(totals, "src_type").select(
        "src_type",
        "dst_type",
        "n_trans",
        "n_src",
        F.floor(
            (F.col("n_trans").cast("double") / F.col("n_src").cast("double"))
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("p_micro"),
    )


def transitions_sql(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> str:
    """DuckDB twin of :func:`event_transitions` — identical lead window,
    marginal re-aggregation, and IEEE association."""
    return (
        f"WITH pairs AS (SELECT {type_col} AS src_type, "
        f"lead({type_col}) OVER "
        f"(PARTITION BY {user_col} ORDER BY {ts_col}, {tiebreak}) "
        f"AS dst_type FROM {table}), "
        "counts AS (SELECT src_type, dst_type, "
        "CAST(COUNT(*) AS BIGINT) AS n_trans FROM pairs "
        "WHERE dst_type IS NOT NULL GROUP BY 1, 2), "
        "totals AS (SELECT src_type, CAST(SUM(n_trans) AS BIGINT) "
        "AS n_src FROM counts GROUP BY 1) "
        "SELECT c.src_type, c.dst_type, c.n_trans, t.n_src, "
        "CAST(FLOOR((CAST(c.n_trans AS DOUBLE) / CAST(t.n_src AS DOUBLE)) "
        "* 1000000.0) AS BIGINT) AS p_micro "
        "FROM counts c JOIN totals t USING (src_type)"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_us: int = WEEK_US,
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen bucket
    (``cohort_week`` = exact integer epoch-µs division), counted as
    retained in every later bucket they were active in.

    Output ``(cohort_week, week_offset, n_users)`` — all BIGINT;
    offset 0 rows are each cohort's size.  Distinct users per cell, so
    multiple events in a week count once.
    """
    firsts = df.groupBy(user_col).agg(F.min(ts_col).alias("_first_ts"))
    joined = df.join(firsts, user_col).select(
        F.col(user_col),
        epoch_us(F.col(ts_col)).alias("_eus"),
        epoch_us(F.col("_first_ts")).alias("_fus"),
    )
    weeks = joined.select(
        user_col,
        F.expr(f"_fus div {int(bucket_us)}").alias("cohort_week"),
        F.expr(f"_eus div {int(bucket_us)}").alias("_week_idx"),
    )
    return (
        weeks.select(
            user_col,
            "cohort_week",
            (F.col("_week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).cast("long").alias("n_users"))
    )


def cohort_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_us: int = WEEK_US,
) -> str:
    """DuckDB twin of :func:`cohort_retention` — ``epoch_us() // n`` is
    the same exact integer division as Spark's ``div``."""
    b = int(bucket_us)
    return (
        f"WITH firsts AS (SELECT {user_col}, "
        f"MIN({ts_col}) AS first_ts FROM {table} GROUP BY {user_col}), "
        f"weeks AS (SELECT e.{user_col}, "
        f"epoch_us(f.first_ts) // {b} AS cohort_week, "
        f"epoch_us(e.{ts_col}) // {b} - epoch_us(f.first_ts) // {b} "
        f"AS week_offset "
        f"FROM {table} e JOIN firsts f ON e.{user_col} = f.{user_col}) "
        f"SELECT cohort_week, week_offset, "
        f"CAST(COUNT(DISTINCT {user_col}) AS BIGINT) AS n_users "
        f"FROM weeks GROUP BY 1, 2"
    )
