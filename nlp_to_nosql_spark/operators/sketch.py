"""Streaming-friendly cardinality / frequency sketches over token streams.

Two fixed-memory sketch operators a 100 TB ingestion pipeline runs
continuously — estimating corpus vocabulary size and catching
heavy-hitter tokens without ever materializing a full-vocabulary
aggregate:

* :func:`hll_registers` — HyperLogLog register table (Flajolet-Martin
  rho over md5-derived 60-bit hashes).  The whole corpus reduces to
  ``m`` integers via one partially-aggregated groupBy on an ``m``-ary
  int key, so the shuffle moves at most ``m`` rows per map partition
  regardless of input size; register tables from disjoint corpus shards
  (or streaming micro-batches) merge by element-wise MAX, which is what
  makes the sketch incremental.
* :func:`cms_heavy_hitters` — a depth×width count-min sketch plus the
  audit join that compares its estimates against exact counts for the
  current top-N tokens.  The sketch itself is one groupBy over a
  ``depth × width``-ary key — fixed memory, mergeable by element-wise
  SUM — and is the piece that survives at 100 TB; the exact-count side
  exists so the contract query can *measure* the overestimate rather
  than argue it.

Both operators are oracle-reproducible by construction: every hash is
the md5-family 60-bit integer (``md5_hash60``) that DuckDB replays as
``CAST('0x' || substr(md5(x), 1, 15) AS UBIGINT)``, and the rho
computation is pure integer math (``length(bin(v & -v))`` — no float
log2, whose rounding at exact powers of two could differ across
engines).

Reference scope note: the reference engine (No_Sql.py) has no sketch
support; these belong to the driver-mandated LLM-data-pipeline
extension surface (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nlp_to_nosql_spark.functions.text import NORMALIZE_SQL, normalize_text
from nlp_to_nosql_spark.operators.dedup import md5_hash60

__all__ = [
    "hll_registers",
    "hll_registers_of",
    "hll_registers_by",
    "hll_ndv_by",
    "hll_ndv_by_sql",
    "hll_overlap",
    "hll_overlap_sql",
    "hll_estimate",
    "cms_cells",
    "cms_heavy_hitters",
    "cms_heavy_hitters_by",
    "cms_heavy_hitters_by_sql",
    "kmv_by",
    "kmv_assemble",
    "kmv_jaccard_pairs",
    "kmv_by_sql",
    "kmv_overlap_sql",
    "tokens_of",
    "tokens_by",
    "HLL_REGISTERS_SQL",
    "CMS_CELLS_SQL",
    "CMS_HEAVY_HITTERS_SQL",
]


def tokens_of(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode normalized whitespace tokens: one ``tok`` row per token
    occurrence (empty tokens dropped).  The shared front end of both
    sketches; stays a zero-shuffle projection."""
    return (
        df.select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
                "tok"
            )
        )
        .where(F.col("tok") != "")
    )


def tokens_by(
    df: DataFrame, key_cols: "list[str]", text_col: str = "text"
) -> DataFrame:
    """Keyed :func:`tokens_of`: ``(key..., tok)`` per token occurrence —
    the front end of the grouped sketches."""
    return (
        df.select(
            *key_cols,
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
                "tok"
            ),
        )
        .where(F.col("tok") != "")
    )


#: DuckDB twin of :func:`tokens_of` — ``{table}``/``{c}`` placeholders.
TOKENS_SQL = (
    "SELECT unnest(string_split("
    + NORMALIZE_SQL.format(c="{c}")
    + ", ' ')) AS tok FROM {table}"
)


def _rho_col(v: Column, max_rho: int) -> Column:
    """Flajolet-Martin rho: 1 + trailing-zero count of ``v``, computed as
    the bit length of the isolated lowest set bit (``v & -v``) — integer
    math only.  ``v == 0`` (all bits zero) maps to ``max_rho``."""
    lowbit = v.bitwiseAND(-v)
    return (
        F.when(v == 0, F.lit(max_rho))
        .otherwise(F.length(F.conv(lowbit.cast("string"), 10, 2)))
        .cast("int")
    )


def hll_registers(
    df: DataFrame,
    text_col: str = "text",
    m: int = 64,
) -> DataFrame:
    """HyperLogLog register table over the distinct normalized tokens of
    ``df[text_col]``: ``(reg, max_rho)`` with ``m`` rows (registers that
    saw no hash are absent — with any realistic corpus all ``m`` appear).

    Layout of the 60-bit md5 hash: low ``log2(m)`` bits pick the
    register, the remaining ``60 - log2(m)`` bits feed rho (position of
    the lowest set bit), exactly reproducible in DuckDB
    (:data:`HLL_REGISTERS_SQL`).

    Scale: tokenization is a zero-shuffle projection; the groupBy is
    partially aggregated to ≤ ``m`` rows per map partition before the
    one shuffle, so a 100 TB corpus moves at most ``m × #partitions``
    int rows.  Register tables merge across shards/batches by
    element-wise MAX — run per-shard, union, re-aggregate.
    """
    return hll_registers_of(tokens_of(df, text_col), "tok", m=m)


def hll_registers_of(
    values: DataFrame, val_col: str, m: int = 64
) -> DataFrame:
    """HLL register table over the raw values of an arbitrary string
    column — the column-general core :func:`hll_registers` wraps with
    tokenization.  Duplicate values are harmless (HLL is a distinct
    counter by construction), so callers can feed a non-distinct frame
    and skip the dedup shuffle entirely.  Used for NDV-driven sizing
    decisions, e.g. the Bloom auto-sizing in
    ``operators/dedup.py::incremental_new_docs``.

    Contract (whole sketch family, both engines): NULL and the empty
    string are NOT values — they are filtered before hashing, exactly
    as the DuckDB twins' ``WHERE tok <> ''`` does.  Harness inputs
    (tokens, fingerprints) are never empty, so this only pins the
    behavior for external callers.

    Snapshot compatibility (round-9 advice): this filter is part of the
    register-table CONTRACT — register snapshots persisted before the
    filter existed counted ``''`` as a real distinct value, so merging
    such a legacy snapshot with freshly computed registers (the
    ``sketch4``/``stream14`` accumulate-by-MAX pattern) can disagree by
    one distinct on data containing empty strings.  Recompute legacy
    snapshots once under the current contract before mixing."""
    if m & (m - 1) or m < 2:
        raise ValueError(f"m must be a power of two >= 2, got {m}")
    p = m.bit_length() - 1
    max_rho = 60 - p + 1
    v = F.col(val_col).cast("string")
    h = md5_hash60(v)
    return (
        values.where(v.isNotNull() & (v != "")).select(
            (h % m).cast("int").alias("reg"),
            F.shiftright(h, p).alias("_v"),
        )
        .select("reg", _rho_col(F.col("_v"), max_rho).alias("_rho"))
        .groupBy("reg")
        .agg(F.max("_rho").alias("max_rho"))
    )


def hll_estimate(registers: list[tuple[int, int]], m: int = 64) -> float:
    """Driver-side HLL cardinality estimate from a collected register
    table (standard bias-corrected harmonic mean; linear counting for
    the small-range regime).  The denominator is accumulated as the
    exact integer ``sum(2 ** (SCALE - rho))`` so the estimate is a pure
    function of the register values, not of float summation order."""
    reg_map = dict(registers)
    scale = 62  # 2**(62 - rho) stays an exact int for rho in [0, 62]
    denom_scaled = sum(1 << (scale - reg_map.get(j, 0)) for j in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)  # standard alpha_m for m >= 128; ok 64
    if m == 64:
        alpha = 0.709
    est = alpha * m * m * (1 << scale) / denom_scaled
    zeros = m - len([1 for j in range(m) if reg_map.get(j, 0) > 0])
    if est <= 2.5 * m and zeros:
        import math

        return m * math.log(m / zeros)
    return est


def hll_registers_by(
    values: DataFrame,
    key_cols: "list[str]",
    val_col: str,
    m: int = 64,
) -> DataFrame:
    """Grouped HLL register tables: one ``m``-register sketch PER KEY —
    ``(key..., reg, max_rho)``.  The per-domain / per-language NDV
    monitor a sharded corpus runs continuously: the groupBy is partially
    aggregated to ≤ ``m`` rows per key per map partition before the one
    shuffle, and per-key register tables merge across shards or
    streaming micro-batches by element-wise MAX exactly like the global
    sketch (same hash family, so a key's grouped registers are
    bit-identical to running :func:`hll_registers_of` on that key's
    filtered rows — test-pinned).  NULL/empty values are filtered, the
    :func:`hll_registers_of` contract."""
    if not key_cols:
        raise ValueError("key_cols must name at least one grouping column")
    if m & (m - 1) or m < 2:
        raise ValueError(f"m must be a power of two >= 2, got {m}")
    p = m.bit_length() - 1
    max_rho = 60 - p + 1
    v = F.col(val_col).cast("string")
    h = md5_hash60(v)
    return (
        values.where(v.isNotNull() & (v != "")).select(
            *key_cols,
            (h % m).cast("int").alias("reg"),
            F.shiftright(h, p).alias("_v"),
        )
        .select(
            *key_cols, "reg", _rho_col(F.col("_v"), max_rho).alias("_rho")
        )
        .groupBy(*key_cols, "reg")
        .agg(F.max("_rho").alias("max_rho"))
    )


def hll_ndv_by(
    values: DataFrame,
    key_cols: "list[str]",
    val_col: str,
    m: int = 64,
) -> DataFrame:
    """Per-key NDV estimates from grouped HLL registers —
    ``(key..., ndv_est)``.

    The estimator is :func:`hll_estimate` pushed into the plan: the
    harmonic-mean denominator ``sum(2^(62 − rho))`` accumulates as an
    EXACT ``decimal(38,0)`` (absent registers contribute ``2^62`` via
    the ``m − present`` count, so the sum never depends on float order
    or register arrival), the bias numerator ``alpha·m²·2^62`` is ONE
    Python-computed double literal shared with the DuckDB twin
    (:func:`hll_ndv_by_sql`), and the small-range linear-counting branch
    ``m·ln(m/zeros)`` mirrors the driver-side function exactly.  ``ln``
    is the one op trusted to the two libms (the BM25 discipline);
    everything else is exact-int-then-one-division.  Error bars are the
    global sketch's ±1.04/√m per key."""
    regs = hll_registers_by(values, key_cols, val_col, m=m)
    return _ndv_from_grouped_registers(regs, key_cols, m=m)


def _ndv_from_grouped_registers(
    regs: DataFrame, key_cols: "list[str]", m: int = 64
) -> DataFrame:
    """The in-plan estimator over a grouped ``(key..., reg, max_rho)``
    register table — shared by :func:`hll_ndv_by` and
    :func:`hll_overlap` (see :func:`hll_ndv_by` for the exactness
    argument)."""
    alpha = 0.709 if m == 64 else 0.7213 / (1 + 1.079 / m)
    num = alpha * m * m * (1 << 62)  # same association as hll_estimate
    two62 = F.lit(1 << 62).cast("decimal(38,0)")
    agg = regs.groupBy(*key_cols).agg(
        F.sum(
            F.expr("shiftleft(1L, 62 - max_rho)").cast("decimal(38,0)")
        ).alias("_ps"),
        F.count(F.lit(1)).cast("long").alias("_present"),
    )
    zeros = F.lit(m) - F.col("_present")
    denom = (F.col("_ps") + zeros.cast("decimal(38,0)") * two62).cast(
        "double"
    )
    est = F.lit(num) / denom
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    ndv = F.when((est <= F.lit(2.5 * m)) & (zeros > 0), lin).otherwise(est)
    return agg.select(
        *key_cols, F.floor(ndv).cast("long").alias("ndv_est")
    )


def hll_overlap(
    values_a: DataFrame,
    values_b: DataFrame,
    val_col: str,
    m: int = 64,
) -> DataFrame:
    """Vocabulary overlap between two corpus snapshots from their HLL
    sketches alone — ONE row ``(ndv_a, ndv_b, ndv_union,
    ndv_intersect, jaccard_micro)``.

    The union sketch is the element-wise MAX of the two register
    tables (the same merge that makes HLL incremental), the
    intersection is inclusion–exclusion ``max(0, a + b − union)`` over
    the FLOORED estimates (exact BIGINT arithmetic), and
    ``jaccard_micro = intersect·10⁶ div union`` (0 when the union is
    empty).  This is the drift/contamination monitor between crawl
    snapshots that never rescans either corpus once the ≤ ``m``-row
    register tables exist — and at 100 TB you persist those per shard
    and merge, never re-reading text.

    Estimator caveat (standard for sketch intersections): a + b − union
    compounds three ±1.04/√m errors, so small true overlaps can
    estimate to 0 — size ``m`` to the overlap you need to resolve, not
    to the corpus NDV.
    """
    tagged = values_a.select(
        F.lit("a").alias("side"), F.col(val_col).alias("_v")
    ).unionByName(
        values_b.select(F.lit("b").alias("side"), F.col(val_col).alias("_v"))
    )
    regs = hll_registers_by(tagged, ["side"], "_v", m=m)
    union_regs = (
        regs.groupBy("reg")
        .agg(F.max("max_rho").alias("max_rho"))
        .select(F.lit("u").alias("side"), "reg", "max_rho")
    )
    ests = _ndv_from_grouped_registers(
        regs.unionByName(union_regs), ["side"], m=m
    )

    def side(s: str) -> Column:
        # an EMPTY side contributes no register rows at all -> no
        # estimate row; its NDV is 0 by definition (mirrored in SQL)
        return F.coalesce(
            F.max(F.when(F.col("side") == s, F.col("ndv_est"))),
            F.lit(0),
        )

    one = ests.groupBy().agg(
        side("a").cast("long").alias("ndv_a"),
        side("b").cast("long").alias("ndv_b"),
        side("u").cast("long").alias("ndv_union"),
    )
    inter = F.greatest(
        F.lit(0).cast("long"),
        F.col("ndv_a") + F.col("ndv_b") - F.col("ndv_union"),
    )
    return one.select(
        "ndv_a",
        "ndv_b",
        "ndv_union",
        inter.alias("ndv_intersect"),
        F.when(
            F.col("ndv_union") > 0,
            F.expr(
                "(greatest(0L, ndv_a + ndv_b - ndv_union) * 1000000L) "
                "div ndv_union"
            ),
        )
        .otherwise(0)
        .cast("long")
        .alias("jaccard_micro"),
    )


def _hash_reg_sql(keys: str, src: str, m: int) -> str:
    """``hs``/``rr``/``regs`` CTE chain: value column ``tok`` of CTE
    ``src`` → grouped ``(keys, reg, max_rho)`` register CTE ``regs``."""
    p = m.bit_length() - 1
    max_rho = 60 - p + 1
    return (
        f"hs AS (SELECT {keys}, "
        "CAST(CAST('0x' || substr(md5(tok), 1, 15) AS UBIGINT) AS BIGINT)"
        f" AS h FROM {src} WHERE tok <> ''), "
        f"rr AS (SELECT {keys}, CAST(h % {m} AS INT) AS reg, "
        f"h >> {p} AS v FROM hs), "
        f"regs AS (SELECT {keys}, reg, "
        f"MAX(CASE WHEN v = 0 THEN {max_rho} "
        "ELSE CAST(length(bin(v & -v)) AS INT) END) AS max_rho "
        f"FROM rr GROUP BY {keys}, reg)"
    )


def _ndv_est_sql(keys: str, src: str, m: int) -> str:
    """``agg``/``est`` CTE chain + final select list replaying
    :func:`_ndv_from_grouped_registers` over register CTE ``src`` —
    every literal ``repr()`` of the SAME Python double the Column form
    uses."""
    alpha = 0.709 if m == 64 else 0.7213 / (1 + 1.079 / m)
    num = alpha * m * m * (1 << 62)
    return (
        f"agg AS (SELECT {keys}, "
        "SUM(CAST(CAST(1 AS BIGINT) << (62 - max_rho) AS HUGEINT)) AS ps, "
        f"CAST(COUNT(*) AS BIGINT) AS present FROM {src} GROUP BY {keys}), "
        f"est AS (SELECT {keys}, {m} - present AS zeros, "
        f"{num!r} / CAST(ps + CAST({m} - present AS HUGEINT) * "
        "CAST(4611686018427387904 AS HUGEINT) AS DOUBLE) AS e FROM agg), "
        f"ndv AS (SELECT {keys}, CAST(FLOOR(CASE WHEN e <= {2.5 * m!r} "
        f"AND zeros > 0 THEN {float(m)!r} * ln({float(m)!r} / zeros) "
        "ELSE e END) AS BIGINT) AS ndv_est FROM est)"
    )


def hll_ndv_by_sql(
    table: str,
    key_cols: "list[str]",
    text_col: str = "text",
    m: int = 64,
) -> str:
    """DuckDB twin of :func:`hll_ndv_by` over the normalized tokens of
    ``table.text_col`` keyed by ``key_cols`` (the ``sketch3`` query
    shape)."""
    keys = ", ".join(key_cols)
    norm = NORMALIZE_SQL.format(c=text_col)
    return (
        f"WITH toks AS (SELECT {keys}, "
        f"unnest(string_split({norm}, ' ')) AS tok FROM {table}), "
        + _hash_reg_sql(keys, "toks", m)
        + ", "
        + _ndv_est_sql(keys, "regs", m)
        + f" SELECT {keys}, ndv_est FROM ndv"
    )


def hll_overlap_sql(
    values_a_sql: str,
    values_b_sql: str,
    m: int = 64,
) -> str:
    """DuckDB twin of :func:`hll_overlap`.  ``values_a_sql`` /
    ``values_b_sql`` are SELECTs producing one value column named
    ``tok``."""
    return (
        f"WITH va AS (SELECT 'a' AS side, tok FROM ({values_a_sql}) qa), "
        f"vb AS (SELECT 'b' AS side, tok FROM ({values_b_sql}) qb), "
        "tagged AS (SELECT * FROM va UNION ALL SELECT * FROM vb), "
        + _hash_reg_sql("side", "tagged", m)
        + ", uregs AS (SELECT 'u' AS side, reg, MAX(max_rho) AS max_rho "
        "FROM regs GROUP BY reg), "
        "allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM uregs), "
        + _ndv_est_sql("side", "allregs", m)
        + ", one AS (SELECT "
        "COALESCE(MAX(CASE WHEN side = 'a' THEN ndv_est END), 0) AS ndv_a, "
        "COALESCE(MAX(CASE WHEN side = 'b' THEN ndv_est END), 0) AS ndv_b, "
        "COALESCE(MAX(CASE WHEN side = 'u' THEN ndv_est END), 0) "
        "AS ndv_union FROM ndv) "
        "SELECT CAST(ndv_a AS BIGINT) AS ndv_a, "
        "CAST(ndv_b AS BIGINT) AS ndv_b, "
        "CAST(ndv_union AS BIGINT) AS ndv_union, "
        "CAST(GREATEST(0, ndv_a + ndv_b - ndv_union) AS BIGINT) "
        "AS ndv_intersect, "
        "CAST(CASE WHEN ndv_union > 0 THEN "
        "(GREATEST(0, ndv_a + ndv_b - ndv_union) * 1000000) // ndv_union "
        "ELSE 0 END AS BIGINT) AS jaccard_micro FROM one"
    )


#: DuckDB twin of :func:`hll_registers` at ``m=64`` (p=6, max_rho=55).
#: ``{table}``/``{c}`` placeholders as in the other *_SQL constants.
HLL_REGISTERS_SQL = (
    "WITH toks AS ("
    + TOKENS_SQL
    + "), hs AS ("
    "SELECT CAST(CAST('0x' || substr(md5(tok), 1, 15) AS UBIGINT) AS BIGINT)"
    " AS h FROM toks WHERE tok <> ''"
    "), rr AS (SELECT CAST(h % 64 AS INT) AS reg, h >> 6 AS v FROM hs) "
    "SELECT reg, MAX(CASE WHEN v = 0 THEN 55 "
    "ELSE CAST(length(bin(v & -v)) AS INT) END) AS max_rho "
    "FROM rr GROUP BY reg"
)


def _cms_cell(j: int, width: int) -> Column:
    """Row-``j`` CMS column index of the current ``tok`` column."""
    return (
        md5_hash60(F.concat(F.lit(f"{j}:"), F.col("tok"))) % width
    ).cast("int")


def cms_cells(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """The bare count-min sketch table ``(row, col, cnt)`` over the
    token stream of ``df[text_col]`` — ≤ ``depth × width`` rows after
    one partially-aggregated groupBy, mergeable across shards/batches by
    cell-wise SUM (the additive twin of :func:`hll_registers`' MAX
    merge; see ``streaming/replay.py::replay_cms_accumulate`` for the
    exactly-once batch-id-keyed streaming fold that additivity
    requires)."""
    toks = tokens_of(df, text_col)
    cells = toks.select(
        F.posexplode(
            F.array(*[_cms_cell(j, width) for j in range(depth)])
        ).alias("row", "col")
    )
    return (
        cells.groupBy(
            # posexplode's position is int32; the oracle's range() rows
            # are int64 — emit BIGINT so the Arrow types line up
            F.col("row").cast("long").alias("row"),
            "col",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


#: DuckDB twin of :func:`cms_cells` at depth=4, width=1024.
CMS_CELLS_SQL = (
    "WITH toks AS ("
    + TOKENS_SQL
    + "), tk AS (SELECT tok FROM toks WHERE tok <> ''), "
    "cells AS (SELECT j AS row, CAST(CAST(CAST('0x' || substr(md5("
    "CAST(j AS VARCHAR) || ':' || tok), 1, 15) AS UBIGINT) AS BIGINT)"
    " % 1024 AS INT) AS col FROM tk, UNNEST(range(0, 4)) u(j)) "
    "SELECT row, col, COUNT(*) AS cnt FROM cells GROUP BY row, col"
)


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    top_n: int = 20,
) -> DataFrame:
    """Count-min-sketch heavy-hitter audit: build a ``depth × width``
    CMS over the token stream, take the exact top-``top_n`` tokens
    (count desc, token asc — deterministic under ties), and return
    ``(tok, true_cnt, est_cnt)`` where ``est_cnt`` is the CMS estimate
    ``min_j cms[j][hash_j(tok)]``.  CMS never undercounts:
    ``est_cnt >= true_cnt`` always, and the gap measures collision
    pressure at this width.

    Row hashes are ``md5_hash60(j || ':' || tok) % width`` — the
    md5-family form DuckDB replays bit-exactly
    (:data:`CMS_HEAVY_HITTERS_SQL`).

    Scale: the sketch build explodes each token occurrence into
    ``depth`` (row, col) cells but partial aggregation collapses them to
    ≤ ``depth × width`` rows per map partition before the single
    shuffle — fixed memory at any corpus size, mergeable by cell-wise
    SUM across shards.  The exact-count side (a full token groupBy) is
    the *audit*, not the production path: at 100 TB you keep the sketch
    and drop the audit, or run the audit over a sampled slice.  The
    estimate join touches ``top_n × depth`` cells against the ≤
    ``depth × width``-row sketch — both sides broadcast-sized by
    construction.
    """
    toks = tokens_of(df, text_col)
    cms = cms_cells(df, text_col, depth=depth, width=width)

    exact = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("true_cnt")
    )
    top = (
        exact.orderBy(F.col("true_cnt").desc(), F.col("tok").asc())
        .limit(top_n)
    )
    probes = top.select(
        "tok",
        "true_cnt",
        F.posexplode(
            F.array(*[_cms_cell(j, width) for j in range(depth)])
        ).alias("row", "col"),
    )
    return (
        F.broadcast(probes)
        .join(cms, ["row", "col"])
        .groupBy("tok", "true_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )


#: DuckDB twin of :func:`cms_heavy_hitters` at depth=4, width=1024,
#: top_n=20.  ``{table}``/``{c}`` placeholders.
CMS_HEAVY_HITTERS_SQL = (
    "WITH toks AS ("
    + TOKENS_SQL
    + "), tk AS (SELECT tok FROM toks WHERE tok <> ''), "
    "cells AS (SELECT j AS row, CAST(CAST(CAST('0x' || substr(md5("
    "CAST(j AS VARCHAR) || ':' || tok), 1, 15) AS UBIGINT) AS BIGINT)"
    " % 1024 AS INT) AS col FROM tk, UNNEST(range(0, 4)) u(j)), "
    "cms AS (SELECT row, col, COUNT(*) AS cnt FROM cells GROUP BY row, col), "
    "exact AS (SELECT tok, COUNT(*) AS true_cnt FROM tk GROUP BY tok), "
    "top AS (SELECT tok, true_cnt FROM exact "
    "ORDER BY true_cnt DESC, tok ASC LIMIT 20), "
    "probes AS (SELECT tok, true_cnt, j AS row, CAST(CAST(CAST('0x' || "
    "substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 15) AS UBIGINT) "
    "AS BIGINT) % 1024 AS INT) AS col FROM top, UNNEST(range(0, 4)) u(j)) "
    "SELECT p.tok, p.true_cnt, MIN(c.cnt) AS est_cnt "
    "FROM probes p JOIN cms c ON p.row = c.row AND p.col = c.col "
    "GROUP BY p.tok, p.true_cnt"
)


def cms_heavy_hitters_by(
    df: DataFrame,
    key_cols: "list[str]",
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    top_n: int = 20,
) -> DataFrame:
    """Grouped :func:`cms_heavy_hitters`: one ``depth × width`` CMS and
    one top-``top_n`` heavy-hitter audit PER KEY — ``(key..., tok,
    true_cnt, est_cnt)`` — the per-domain frequent-token monitor.

    The sketch side partially aggregates to ≤ ``depth × width`` cells
    per key per map partition before its one shuffle and merges across
    shards by cell-wise SUM within a key, exactly like the global
    sketch.  The exact side ranks tokens per key with a window
    partitioned on the key (no global LIMIT funnel — every key's top-N
    resolves independently); as with the global operator, the exact
    audit is the measurement path, not the 100 TB production path.
    Est never undercounts within a key (per-key cells are disjoint by
    construction since the key is part of the cell grouping)."""
    from pyspark.sql import Window

    if not key_cols:
        raise ValueError("key_cols must name at least one grouping column")
    toks = tokens_by(df, key_cols, text_col)
    cells = toks.select(
        *key_cols,
        F.posexplode(
            F.array(*[_cms_cell(j, width) for j in range(depth)])
        ).alias("row", "col"),
    )
    cms = (
        cells.groupBy(
            *key_cols, F.col("row").cast("long").alias("row"), "col"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    exact = toks.groupBy(*key_cols, "tok").agg(
        F.count(F.lit(1)).cast("long").alias("true_cnt")
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("true_cnt").desc(), F.col("tok").asc()
    )
    top = (
        exact.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= top_n)
        .drop("_rk")
    )
    probes = top.select(
        *key_cols,
        "tok",
        "true_cnt",
        F.posexplode(
            F.array(*[_cms_cell(j, width) for j in range(depth)])
        ).alias("row", "col"),
    ).withColumn("row", F.col("row").cast("long"))
    return (
        probes.join(cms, [*key_cols, "row", "col"])
        .groupBy(*key_cols, "tok", "true_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )


def cms_heavy_hitters_by_sql(
    table: str,
    key_cols: "list[str]",
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    top_n: int = 20,
) -> str:
    """DuckDB twin of :func:`cms_heavy_hitters_by` (QUALIFY replays the
    per-key rank window)."""
    keys = ", ".join(key_cols)
    pk = ", ".join(f"p.{k}" for k in key_cols)
    on = " AND ".join(
        [f"p.{k} = c.{k}" for k in key_cols]
        + ["p.row = c.row", "p.col = c.col"]
    )
    norm = NORMALIZE_SQL.format(c=text_col)
    cell = (
        "CAST(CAST(CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || "
        f"tok), 1, 15) AS UBIGINT) AS BIGINT) % {width} AS INT)"
    )
    return (
        f"WITH toks AS (SELECT {keys}, "
        f"unnest(string_split({norm}, ' ')) AS tok FROM {table}), "
        f"tk AS (SELECT {keys}, tok FROM toks WHERE tok <> ''), "
        f"cells AS (SELECT {keys}, j AS row, {cell} AS col "
        f"FROM tk, UNNEST(range(0, {depth})) u(j)), "
        f"cms AS (SELECT {keys}, row, col, COUNT(*) AS cnt "
        f"FROM cells GROUP BY {keys}, row, col), "
        f"exact AS (SELECT {keys}, tok, COUNT(*) AS true_cnt "
        f"FROM tk GROUP BY {keys}, tok), "
        f"top AS (SELECT {keys}, tok, true_cnt FROM exact "
        f"QUALIFY ROW_NUMBER() OVER (PARTITION BY {keys} "
        f"ORDER BY true_cnt DESC, tok ASC) <= {top_n}), "
        f"probes AS (SELECT {keys}, tok, true_cnt, j AS row, {cell} AS col "
        f"FROM top, UNNEST(range(0, {depth})) u(j)) "
        f"SELECT {pk}, p.tok, p.true_cnt, MIN(c.cnt) AS est_cnt "
        f"FROM probes p JOIN cms c ON {on} "
        f"GROUP BY {pk}, p.tok, p.true_cnt"
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch + sketch-space Jaccard
# ---------------------------------------------------------------------------


def kmv_by(
    df: DataFrame,
    key_cols: "list[str]",
    text_col: str = "text",
    k: int = 64,
    salt: int = 16,
) -> DataFrame:
    """Bottom-k (KMV) distinct sketch per key group: the ``k`` smallest
    60-bit md5 hashes of the group's distinct normalized tokens (Bar-
    Yossef et al. 2002; Beyer et al., SIGMOD 2007).  The third sketch
    family after HLL (NDV) and CMS (frequency): unlike HLL registers, a
    bottom-k sketch supports SET operations in sketch space — the
    k smallest of a union is computable from the two sketches alone —
    which is what :func:`kmv_jaccard_pairs` exploits for containment/
    overlap estimates HLL cannot give directly.

    Returns ``(key..., kmv array<long> ascending, n_kept, ndv_est)``.
    When the group has fewer than ``k`` distinct tokens the sketch IS
    the distinct set and ``ndv_est = n_kept`` exactly; otherwise the
    standard KMV estimator ``floor((k−1)·2⁶⁰ / h_k)`` — the numerator
    is one exact IEEE double (small int × power of two), the divide is
    the one shared float op, so the estimate replays bit-exactly in
    DuckDB (:func:`kmv_by_sql`).  NULL/empty tokens are not values
    (the HLL register contract).

    Scale shape: tokenize (zero-shuffle) → one distinct groupBy of
    ``(key, hash)`` (map-side combined) → SALTED two-stage bottom-k
    (``hash % salt`` sub-partitions keep a hot key's distinct hashes
    off a single reducer; second stage ranks ``k·salt`` survivors per
    key) → one ≤ k-row-per-key collect_list.  Sketches merge across
    shards by union + re-rank, same discipline as the HLL MAX-merge.
    """
    if k < 2:
        raise ValueError("kmv_by: k must be >= 2")
    from pyspark.sql import Window

    toks = tokens_by(df, key_cols, text_col)
    dist = (
        toks.select(*key_cols, md5_hash60(F.col("tok")).alias("h"))
        .groupBy(*key_cols, "h")
        .agg(F.lit(1))
        .select(*key_cols, "h")
    )
    salted = dist.withColumn(
        "_s", F.pmod(F.col("h"), F.lit(int(salt))).cast("int")
    )
    w1 = Window.partitionBy(*key_cols, "_s").orderBy("h")
    local = salted.withColumn("_rn", F.row_number().over(w1)).filter(
        F.col("_rn") <= k
    )
    w2 = Window.partitionBy(*key_cols).orderBy("h")
    glob = local.withColumn("_rn2", F.row_number().over(w2)).filter(
        F.col("_rn2") <= k
    )
    return kmv_assemble(glob, key_cols, k)


def kmv_assemble(
    rows: DataFrame, key_cols: "list[str]", k: int
) -> DataFrame:
    """Assemble ``(key..., kmv, n_kept, ndv_est)`` sketches from a
    ``(key..., h)`` bottom-k hash frame (≤ k rows per key) — the shared
    back half of :func:`kmv_by` and the streaming accumulate
    (``streaming/replay.py::replay_kmv_accumulate``), so the batch and
    streaming paths produce byte-identical sketches by construction."""
    num = float((k - 1) * (1 << 60))  # exact: small int × 2^60
    agg = rows.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list("h")).alias("kmv"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    return agg.select(
        *key_cols,
        "kmv",
        "n_kept",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.floor(
                F.lit(num) / F.element_at("kmv", k).cast("double")
            ).cast("long")
        )
        .alias("ndv_est"),
    )


def kmv_jaccard_pairs(sketches: DataFrame, key_col: str, k: int) -> DataFrame:
    """Pairwise Jaccard estimates between every two key groups, computed
    ENTIRELY in sketch space: ``U_k`` = the ``k`` smallest of the two
    sketches' union (exactly the union's own KMV sketch), and
    ``J ≈ |{h ∈ U_k : h ∈ A ∧ h ∈ B}| / |U_k|`` (Beyer et al. 2007
    §5).  Input is :func:`kmv_by` output; the join is
    ``#groups²/2``-sized — sketch rows, never corpus rows.

    Returns ``(key_a, key_b, union_k, inter_k, jaccard_est)`` for
    ``key_a < key_b``; ``jaccard_est`` rounds half-away-from-zero to 6
    places in both engines (one exact integer ratio through one IEEE
    divide)."""
    a = sketches.select(
        F.col(key_col).alias("key_a"),
        F.col("kmv").alias("_ka"),
        F.col("ndv_est").alias("ndv_a"),
    )
    b = sketches.select(
        F.col(key_col).alias("key_b"),
        F.col("kmv").alias("_kb"),
        F.col("ndv_est").alias("ndv_b"),
    )
    joined = a.join(b, F.col("key_a") < F.col("key_b"))
    u = F.slice(
        F.array_sort(F.array_union(F.col("_ka"), F.col("_kb"))), 1, int(k)
    )
    staged = joined.select(
        "key_a", "key_b", "ndv_a", "ndv_b", "_ka", "_kb", u.alias("_u")
    )
    inter = F.filter(
        F.col("_u"),
        lambda h: F.array_contains(F.col("_ka"), h)
        & F.array_contains(F.col("_kb"), h),
    )
    return staged.select(
        "key_a",
        "key_b",
        "ndv_a",
        "ndv_b",
        F.size("_u").cast("long").alias("union_k"),
        F.size(inter).cast("long").alias("inter_k"),
        F.round(
            F.size(inter).cast("double") / F.size("_u").cast("double"), 6
        ).alias("jaccard_est"),
    )


def _kmv_sketch_ctes(
    key_col: str, k: int, table: str, text_col: str
) -> str:
    """CTE chain ``t``/``hs``/``bk``/``km``/``sk`` building per-key KMV
    sketches — shared by :func:`kmv_by_sql` and :func:`kmv_overlap_sql`."""
    norm = NORMALIZE_SQL.format(c=f"COALESCE({text_col}, '')")
    num = float((k - 1) * (1 << 60))
    return (
        f"t AS (SELECT {key_col} AS key, "
        f"unnest(string_split({norm}, ' ')) AS tok FROM {table}), "
        "hs AS (SELECT DISTINCT key, "
        "CAST(CAST('0x' || substr(md5(tok), 1, 15) AS UBIGINT) AS BIGINT) "
        "AS h FROM t WHERE tok <> ''), "
        "bk AS (SELECT key, h FROM hs "
        f"QUALIFY ROW_NUMBER() OVER (PARTITION BY key ORDER BY h) <= {k}), "
        "km AS (SELECT key, list_sort(list(h ORDER BY h)) AS kmv, "
        "CAST(COUNT(*) AS BIGINT) AS n_kept FROM bk GROUP BY key), "
        "sk AS (SELECT key, kmv, n_kept, "
        f"CASE WHEN n_kept < {k} THEN n_kept "
        f"ELSE CAST(FLOOR({num!r} / CAST(kmv[{k}] AS DOUBLE)) AS BIGINT) "
        "END AS ndv_est FROM km)"
    )


def kmv_by_sql(
    key_col: str = "lang",
    k: int = 64,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`kmv_by` alone: the per-key sketches
    ``(key, kmv, n_kept, ndv_est)`` — also the shared oracle of the
    streaming accumulate (the fold must equal the batch sketch)."""
    return (
        "WITH "
        + _kmv_sketch_ctes(key_col, k, table, text_col)
        + f" SELECT key AS {key_col}, kmv, n_kept, ndv_est FROM sk"
    )


def kmv_overlap_sql(
    key_col: str = "lang",
    k: int = 64,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``kmv_by`` + ``kmv_jaccard_pairs`` over one keyed
    corpus — same 60-bit md5 hashes, same bottom-k (QUALIFY row_number),
    same sketch-space union/intersection algebra."""
    return (
        "WITH "
        + _kmv_sketch_ctes(key_col, k, table, text_col)
        + ", "
        "pairs AS (SELECT a.key AS key_a, b.key AS key_b, "
        "a.kmv AS ka, b.kmv AS kb, "
        "a.ndv_est AS ndv_a, b.ndv_est AS ndv_b, "
        f"list_sort(list_distinct(a.kmv || b.kmv))[1:{k}] AS u "
        "FROM sk a JOIN sk b ON a.key < b.key) "
        "SELECT key_a, key_b, ndv_a, ndv_b, "
        "CAST(len(u) AS BIGINT) AS union_k, "
        "CAST(len([x for x in u IF list_contains(ka, x) "
        "AND list_contains(kb, x)]) AS BIGINT) AS inter_k, "
        "ROUND(CAST(len([x for x in u IF list_contains(ka, x) "
        "AND list_contains(kb, x)]) AS DOUBLE) / CAST(len(u) AS DOUBLE), 6) "
        "AS jaccard_est FROM pairs"
    )
