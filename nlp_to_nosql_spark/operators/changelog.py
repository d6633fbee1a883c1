"""Changelog compaction and slowly-changing-dimension history — the
incremental-ingest layer of a continuously-refreshed corpus.

A 100 TB training corpus is not rebuilt from scratch; it is *merged*:
upsert feeds (CDC streams, re-crawls, label fixes) arrive as
append-only changelogs and must be compacted to latest-state, and the
history of each entity's attribute over time must be queryable (which
label did this document carry when snapshot X was cut?).  The reference
engine's history sink (`mongodb.py` `save_query_history`) appends an
event log; these operators are the corresponding *read* side, Spark-
first.

Scale design:

* :func:`latest_wins` is a ``groupBy(keys).agg(max_by(...))`` — an
  aggregate with **map-side partial aggregation** (struct-typed buffers
  plan as SortAggregate with ``partial_max_by``), not a window sort.  At
  100 TB the partial aggregate collapses each map partition to one row
  per key before the shuffle, so shuffle bytes are bounded by
  |distinct keys|, while the window formulation (the oracle's
  ``row_number``) would shuffle every changelog row and sort.  The two
  are value-identical whenever the ordering tuple is unique per key
  (enforce with a unique tiebreak column, e.g. the event id).
* :func:`scd2_intervals` needs total per-key order, so it IS a window —
  one hash shuffle on the key, one in-partition sort shared by the
  ``lag``/``lead``/``row_number`` trio (same partition+order → Catalyst
  plans a single Window node, single sort).  State per key is O(1).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    payload: Sequence[str],
) -> DataFrame:
    """Compact a changelog to its latest state: one row per ``keys``
    tuple, carrying the ``payload`` columns of the row with the greatest
    ``order_by`` tuple (lexicographic; later columns break ties).

    The ordering tuple must be unique per key (make the last ``order_by``
    column a unique id) or the surviving payload is nondeterministic —
    the same contract pandas ``drop_duplicates(keep='last')`` and the
    Delta/Iceberg ``MERGE`` latest-wins idiom impose.  Rows whose entire
    ordering tuple is NULL never win against a non-NULL tuple (Spark
    ``max_by`` ignores NULL ordering keys; a NULL *component* inside a
    struct still participates and sorts low).

    Plan: single partial-aggregated hash aggregate (see module
    docstring).  Output columns: ``*keys``, then ``*order_by``, then
    ``*payload`` — the order columns are re-emitted from the winning row
    so the result is self-describing.
    """
    ord_struct = F.struct(*[F.col(c) for c in order_by])
    win = F.max_by(
        F.struct(*[F.col(c) for c in (*order_by, *payload)]), ord_struct
    ).alias("_w")
    out = df.groupBy(*[F.col(k) for k in keys]).agg(win)
    return out.select(
        *[F.col(k) for k in keys],
        *[F.col(f"_w.{c}").alias(c) for c in (*order_by, *payload)],
    )


def latest_wins_sql(
    keys: Sequence[str],
    order_by: Sequence[str],
    payload: Sequence[str],
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`latest_wins`, formulated as the classic
    ``row_number() = 1`` window — deliberately a DIFFERENT algorithm
    (total sort per key) than the Spark side's partial-aggregated
    ``max_by``, so the oracle independently checks the latest-wins
    *semantics* rather than replaying the same plan.  Value-identical
    because the ordering tuple is unique per key."""
    part = ", ".join(keys)
    ordr = ", ".join(f"{c} DESC" for c in order_by)
    cols = ", ".join((*keys, *order_by, *payload))
    return (
        f"SELECT {cols} FROM ("
        f"SELECT *, row_number() OVER "
        f"(PARTITION BY {part} ORDER BY {ordr}) AS _rn FROM {table}"
        f") WHERE _rn = 1"
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Build SCD-type-2 validity intervals from an event log: for each
    ``key``, collapse consecutive observations with the same ``attr``
    value and emit one row per *change segment* with
    ``(valid_from, valid_to, version)`` — ``valid_to`` is NULL for the
    currently-open segment, and ``version`` counts segments 1..n per key
    in time order.

    Change detection is NULL-safe (``attr IS DISTINCT FROM`` its
    predecessor): a NULL attribute value is a real segment, and a
    re-appearing value (A → B → A) yields three segments, not two — SCD2
    tracks *when*, not *which*.  ``tiebreak`` (a unique id) makes the
    per-key order total, so segments are deterministic under equal
    timestamps.

    Plan: one hash shuffle on ``key``; ``lag`` (change flag), then
    ``lead``/``row_number`` over the change rows.  The second window
    re-uses the first's partitioning (same key), so Catalyst plans one
    exchange; the filter between them cuts the sorted stream before the
    second sort.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    changed = ~F.col(attr).eqNullSafe(F.lag(attr).over(w)) | (
        F.row_number().over(w) == 1
    )
    seg = df.select(
        key, attr, ts_col, tiebreak, changed.alias("_chg")
    ).filter(F.col("_chg"))
    w2 = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    return seg.select(
        F.col(key),
        F.col(attr),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("int").alias("version"),
    )


def scd2_snapshot(
    intervals: DataFrame,
    key: str,
    attr: str,
    at: str,
) -> DataFrame:
    """Point-in-time query over :func:`scd2_intervals` output: the
    ``attr`` value each ``key`` carried at timestamp ``at`` (ISO string)
    — "which label did this entity have when the snapshot was cut?".

    A segment is active when ``valid_from <= at < valid_to`` with a
    NULL ``valid_to`` meaning still-open; keys whose first segment
    starts after ``at`` are absent (they did not exist yet).  At most
    one segment matches per key by construction, so this is a plain
    filter — zero shuffle over the interval table, and at rest the
    ``valid_from`` predicate pushes into the parquet scan.
    """
    ts = F.lit(at).cast("timestamp_ntz")
    return intervals.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    ).select(key, attr, "valid_from", "version")


def scd2_snapshot_sql(
    key: str,
    attr: str,
    ts_col: str,
    tiebreak: str,
    at: str,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`scd2_snapshot` chained over
    :func:`scd2_sql`'s intervals."""
    return (
        f"WITH iv AS ({scd2_sql(key, attr, ts_col, tiebreak, table)}) "
        f"SELECT {key}, {attr}, valid_from, version FROM iv "
        f"WHERE valid_from <= TIMESTAMP '{at}' "
        f"AND (valid_to IS NULL OR valid_to > TIMESTAMP '{at}')"
    )


def scd2_sql(
    key: str,
    attr: str,
    ts_col: str,
    tiebreak: str,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`scd2_intervals` — identical NULL-safe
    change-point filter (``IS DISTINCT FROM`` + first-row), identical
    lead/row_number over the change rows."""
    return (
        f"WITH ordered AS (SELECT {key}, {attr}, {ts_col}, {tiebreak}, "
        f"lag({attr}) OVER w AS _prev, "
        f"(row_number() OVER w) = 1 AS _first "
        f"FROM {table} WINDOW w AS "
        f"(PARTITION BY {key} ORDER BY {ts_col}, {tiebreak})), "
        f"seg AS (SELECT * FROM ordered "
        f"WHERE _first OR {attr} IS DISTINCT FROM _prev) "
        f"SELECT {key}, {attr}, {ts_col} AS valid_from, "
        f"lead({ts_col}) OVER w2 AS valid_to, "
        f"CAST(row_number() OVER w2 AS INT) AS version "
        f"FROM seg WINDOW w2 AS "
        f"(PARTITION BY {key} ORDER BY {ts_col}, {tiebreak})"
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Corpus snapshot diff: per-status document counts between two
    fingerprinted snapshots — the versioning primitive behind "what did
    this re-crawl / cleaning pass actually touch?", answered BEFORE
    committing a corpus rebuild.

    ``status ∈ (added, removed, changed, unchanged)``: membership from
    a full outer join on the id, change from the content fingerprints
    compared NULL-safely (a NULL fingerprint — e.g. a NULL-text doc —
    is a value, not absence: presence is carried by marker columns, so
    NULL fp on both sides reads ``unchanged``, and NULL→text reads
    ``changed``).  Returns ``(status, n_docs)``.

    Plan: both sides shuffle once on the shared id (co-keyed full outer
    sort-merge join; with both snapshots bucketed by id at rest the
    exchange disappears), then a ≤4-row partial-aggregated groupBy —
    nothing document-sized ever moves, only (id, fp).
    """
    a = old.select(
        F.col(id_col),
        F.col(fp_col).alias("_fp_a"),
        F.lit(True).alias("_in_a"),
    )
    b = new.select(
        F.col(id_col),
        F.col(fp_col).alias("_fp_b"),
        F.lit(True).alias("_in_b"),
    )
    j = a.join(b, id_col, "full")
    status = (
        F.when(F.col("_in_a").isNull(), F.lit("added"))
        .when(F.col("_in_b").isNull(), F.lit("removed"))
        .when(
            ~F.col("_fp_a").eqNullSafe(F.col("_fp_b")), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def snapshot_diff_sql(
    old_sql: str,
    new_sql: str,
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> str:
    """DuckDB twin of :func:`snapshot_diff` — identical marker-column
    membership and ``IS DISTINCT FROM`` change test.  ``old_sql`` /
    ``new_sql`` are SELECTs yielding ``(id_col, fp_col)``."""
    return (
        f"WITH snap_a AS ({old_sql}), snap_b AS ({new_sql}), "
        f"j AS (SELECT a.{fp_col} AS fa, b.{fp_col} AS fb, "
        "a.ia AS ia, b.ib AS ib FROM "
        f"(SELECT {id_col}, {fp_col}, TRUE AS ia FROM snap_a) a "
        f"FULL OUTER JOIN "
        f"(SELECT {id_col}, {fp_col}, TRUE AS ib FROM snap_b) b "
        f"USING ({id_col})) "
        "SELECT CASE WHEN ia IS NULL THEN 'added' "
        "WHEN ib IS NULL THEN 'removed' "
        "WHEN fa IS DISTINCT FROM fb THEN 'changed' "
        "ELSE 'unchanged' END AS status, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs FROM j GROUP BY 1"
    )
