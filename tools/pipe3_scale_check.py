"""End-to-end scale-invariance check for the composed corpus build (pipe3).

The per-family scale probe (tools/scale_probe.py) measures the GROWTH
CURVE of each heavy operator; this tool proves the composed pipeline's
ANSWER is still exactly right at N× — it builds the same synthetic N×
documents corpus the probe uses (Caesar-rotated copies, disjoint
vocabularies), runs the full pipe3 plan (Gopher → exact dedup →
winnowing decontamination → temperature mixture → chunking) on Spark,
replays the identical pipeline with pipe3's own oracle SQL in DuckDB
over the SAME parquet, and compares row count, Arrow type signatures,
and the order-insensitive value multiset — the driver's exact bar, at a
corpus 10× anything the driver checks.

Usage: python tools/pipe3_scale_check.py [sf_dir] [copies]
(defaults /root/testdata/sf0.1, 10 — ~2 min on local[32]).
"""

from __future__ import annotations

import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

import duckdb

import scale_probe as sp
import selfcheck as sc
import __spark_entry__ as entrymod
from nlp_to_nosql_spark.session import get_spark
from nlp_to_nosql_spark.sources.catalog import register_tables

QUERY = "pipe3_pretraining_e2e"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = get_spark("pipe3_scale_check", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    tables = register_tables(spark, sf_dir)

    # Stage the N× corpus as a minimal sf-dir (register_tables skips the
    # other tables' missing files) so the UNMODIFIED queries()/oracle_sql()
    # entries run against it.
    scaled_dir = f"/tmp/spark_graft_pipe3_scale/{copies}x"
    docs_path = os.path.join(scaled_dir, "documents.parquet")
    sp.scaled_documents(tables["documents"], copies).write.mode(
        "overwrite"
    ).parquet(docs_path)
    n_docs = spark.read.parquet(docs_path).count()
    print(f"scaled corpus: {n_docs} documents ({copies}x of {sf_dir})")

    t0 = time.time()
    sdf = entrymod.queries()[QUERY](spark, scaled_dir)
    scols, srows, ssigs = sc.arrow_table_rows(sdf.toArrow())
    t_spark = time.time() - t0
    print(f"spark: {len(srows)} chunks [{t_spark:.1f}s]")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{docs_path}/*.parquet'"
    )
    t0 = time.time()
    ocols, orows, osigs = sc.arrow_table_rows(
        con.execute(entrymod.oracle_sql()[QUERY]).arrow()
    )
    t_duck = time.time() - t0
    print(f"duckdb: {len(orows)} chunks [{t_duck:.1f}s]")

    problems = []
    if len(srows) != len(orows):
        problems.append(f"row count {len(srows)} != {len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
    else:
        type_diffs = [
            f"{c}: spark={ssigs[c]} oracle={osigs[c]}"
            for c in scols
            if ssigs[c] != osigs[c]
        ]
        if type_diffs:
            problems.append("arrow type mismatch " + "; ".join(type_diffs))
    if not problems:
        sm = sc.row_multiset(scols, srows)
        om = sc.row_multiset(ocols, orows)
        if sm != om:
            diff = (sm - om) + (om - sm)
            problems.append(
                f"value mismatch on {sum(diff.values())} rows; "
                f"sample {list(diff)[:3]}"
            )

    if problems:
        print(f"FAIL at {copies}x: " + "; ".join(problems))
    else:
        print(
            f"OK: pipe3 at {copies}x ({n_docs} docs -> {len(srows)} chunks) "
            "matches the DuckDB replay value-for-value"
        )
    spark.stop()
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
