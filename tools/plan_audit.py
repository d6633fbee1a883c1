"""Physical-plan audit over every driver-contract query.

Greps each query's formatted explain output for scale red flags:

* ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — a candidate join
  that degenerated into all-pairs;
* ``BatchEvalPython`` — a row-at-a-time Python UDF in the data path
  (Arrow-batched ``ArrowEvalPython`` / ``MapInPandas`` are fine);
* unusually high Exchange counts — a pipeline shuffling more than its
  shape requires.

Streaming replay queries are skipped: building them executes the replay,
and their plan is the batch parity query's plan anyway.

Usage: python tools/plan_audit.py [sf_dir]
Exit code 1 if any hard red flag (cartesian/row-UDF) is found.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from nlp_to_nosql_spark.session import get_spark

SKIP = {
    "stream2_sessionize_stream",
    "stream3_windowed_counts_stream",
    "stream4_dedup_stream",
    "stream5_dim_join_stream",
    "stream6_running_totals",
    "stream7_stream_stream_join",
    "stream8_dedup_within_watermark",
    "stream9_native_session_stream",
}

HARD_FLAGS = ("CartesianProduct", "BatchEvalPython")
SOFT_FLAGS = ("BroadcastNestedLoopJoin",)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod.register_tables(spark, sf_dir)

    hard = 0
    for name, fn in entrymod.queries().items():
        if name in SKIP:
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        nodes = Counter(re.findall(r"^\s*\(\d+\)\s+(\S+)", plan, re.M))
        flags = [f for f in HARD_FLAGS if nodes.get(f)]
        hard += len(flags)
        flags += [f"{f}(soft)" for f in SOFT_FLAGS if nodes.get(f)]
        n_exch = nodes.get("Exchange", 0)
        if n_exch >= 8:
            flags.append(f"exchanges={n_exch}")
        status = " ".join(flags) if flags else "ok"
        print(f"  {name:32s} {status}")
        spark.catalog.clearCache()

    spark.stop()
    print("hard flags:", hard)
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main())
