"""Micro-bench: time named contract queries with bench.py's methodology
(construct + noop sink, clearCache between runs, min-of-N) without the
full 241-query sweep — for optimization iteration only; the driver's
artifact is still bench.py.

Usage: python tools/microbench.py [-n RUNS] [--jobs] [sf_dir] query [query ...]

``--jobs`` additionally reports how many Spark jobs each query run
dispatched (construct + noop action), via a per-run job group — the
fixed-dispatch cost a floor-bound query pays is ~proportional to this
count, so it is the number the job-count optimizations move.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    count_jobs = False
    if args and args[0] == "--jobs":
        count_jobs = True
        args = args[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args

    from nlp_to_nosql_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("microbench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    qs = entrymod.queries()
    by_prefix = {n.split("_")[0]: n for n in qs}
    entrymod.register_tables(spark, sf_dir)

    # Same warm-up as bench.py.
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.filter(F.col("l_quantity") > 0).groupBy("l_returnflag").count().collect()

    @pandas_udf("double")
    def _warm(v):
        return v * 1.0

    spark.range(10_000).repartition(int(spark.sparkContext.defaultParallelism)).select(
        _warm(F.col("id").cast("double"))
    ).write.mode("overwrite").format("noop").save()

    for want in names:
        name = want if want in qs else by_prefix.get(want)
        if name is None:
            print(f"SKIP unknown query: {want}")
            continue
        times = []
        jobs = []
        for i in range(runs):
            group = f"mb:{name}:{i}"
            if count_jobs:
                spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
            if count_jobs:
                jobs.append(
                    len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))
                )
                spark.sparkContext.setJobGroup(None, None)
            spark.catalog.clearCache()
        jtxt = f"  jobs={jobs}" if count_jobs else ""
        print(f"{name:42s} min={min(times):6.3f}  all={times}{jtxt}  load={os.getloadavg()[0]:.1f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
