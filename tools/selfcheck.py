"""Self-check harness replicating the driver's DuckDB-oracle comparison.

For every ``queries()`` entry with an ``oracle_sql()`` twin, run both at a
scale factor and compare row count, column names, and an order-insensitive
value multiset.  Floats are canonicalized to 9 significant digits so the
check matches the driver's hash semantics in spirit while tolerating
last-ulp differences (our queries round computed floats explicitly, so
raw values should already be bit-identical).

The Spark session is deliberately a PLAIN one (no engine confs) to mirror
the driver harness: every conf the contract needs (e.g. the nanos-parquet
legacy flag) must be set by the library itself at runtime, or this check
fails the same way the driver would.  Pass --engine-session to use
``get_spark`` instead.

Usage: python tools/selfcheck.py [--engine-session] [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from nlp_to_nosql_spark.sources.catalog import TABLES


def canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.9g}")
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    argv = list(sys.argv[1:])
    engine_session = "--engine-session" in argv
    if engine_session:
        argv.remove("--engine-session")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    if engine_session:
        from nlp_to_nosql_spark.session import get_spark

        spark = get_spark("selfcheck", master="local[8]")
    else:
        # Driver parity: a bare session with none of the engine's confs.
        spark = (
            SparkSession.builder.appName("selfcheck")
            .master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .getOrCreate()
        )
    spark.sparkContext.setLogLevel("ERROR")

    # Self-document the runtime: the round-2 NTZ break shipped blind because
    # selfcheck ran on a different interpreter than the driver harness.
    import pyspark

    print(f"interpreter: {sys.executable}")
    print(f"pyspark: {pyspark.__version__} ({os.path.dirname(pyspark.__file__)})")
    print(f"sf_dir: {sf_dir}")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures, weak = [], []
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            weak.append(name)
            print(f"  {name:32s} rows={len(srows):7d}  (no oracle — weak check) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        ocols = [d[0] for d in con.execute(oracles[name]).description]
        orows = con.execute(oracles[name]).fetchall()

        problems = []
        if len(srows) != len(orows):
            problems.append(f"row count {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sm, om = row_multiset(scols, srows), row_multiset(ocols, orows)
            if sm != om:
                diff = (sm - om) + (om - sm)
                sample = list(diff)[:3]
                problems.append(f"value mismatch on {sum(diff.values())} rows; sample {sample}")
        status = "OK " if not problems else "FAIL"
        print(f"  {name:32s} rows={len(srows):7d}  {status} [{time.time()-t0:.1f}s]"
              + ("  " + "; ".join(problems) if problems else ""))
        if problems:
            failures.append((name, problems))

    print(f"\n{n_checked - len(failures) - len(weak)}/{n_checked} oracle-checked OK, "
          f"{len(weak)} weak (no oracle), {len(failures)} FAILED")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
