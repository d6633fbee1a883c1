"""Dump `.explain("formatted")` for named contract queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [sf_dir] query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query.  Streaming replay
queries execute on construction (their plan is the batch twin's), so the
dump still works — it just takes the replay's wall time.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from nlp_to_nosql_spark.session import get_spark


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", rest
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod.register_tables(spark, sf_dir)
    qs = entrymod.queries()
    # Short prefix ("tok6") or full name both accepted.
    by_prefix = {n.split("_")[0]: n for n in qs}
    for want in names:
        name = want if want in qs else by_prefix.get(want)
        if name is None:
            print(f"SKIP unknown query: {want}")
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
