"""Per-query isolation bench for the optimization rounds (guide §1.4).

NOT the driver's bench — bench.py stays frozen.  This harness times a
chosen subset of queries with the same methodology (noop sink, one
untimed warmup, median of 3) and can dump `.explain("formatted")` plans
to a directory, so before/after evidence for OPTIMIZATION_r09.md comes
from one tool.

Usage:
  python bench_extra.py q1 q2 ...           # time those queries
  python bench_extra.py --plans DIR q1 ...  # also write DIR/<q>.txt plans
  python bench_extra.py --reps N ...        # timed passes (default 3)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
measurement scale), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    reps = 3
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    suffix = ""
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    from katydid_haskell_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench-extra", cores=cpus,
                      shuffle_partitions=min(2 * cpus, 32))
    qs = entry_mod.queries()

    # same session warmup as bench.py
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    _force(spark.read.parquet(f"{sf_dir}/lineitem.parquet")
           .groupBy("l_returnflag").count())

    @pandas_udf("long")
    def _warm(x):
        return x

    _force(spark.range(0, 10_000, numPartitions=cpus).select(_warm("id")))

    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = fn(spark, sf_dir)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"),
                      "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        _force(df)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
        out[name] = round(sorted(times)[len(times) // 2], 3)
        print(json.dumps({name: out[name], "samples":
                          [round(t, 3) for t in times]}), flush=True)
        spark.catalog.clearCache()

    print(json.dumps({"total": round(sum(out.values()), 3),
                      "queries": out, "sf_dir": sf_dir,
                      "load1": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
