"""Order-of-magnitude scale sweep: every driver-contract query timed at
sf0.1 and the synthesized sf1 (scripts/make_sf1.py), warm + median-of-3
per query per scale, one session per scale.  Prints a JSON line per scale
and a markdown table; BENCH/SF1.md is written from the output.

Usage: python scripts/sf1_sweep.py [sf1_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_AQE", "false")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(df):
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


def sweep(sf_dir: str, cores: int = 32) -> dict:
    from katydid_haskell_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(f"sf1-sweep-{os.path.basename(sf_dir)}", cores=cores,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    out = {}
    for name, fn in qs.items():
        try:
            _force(fn(spark, sf_dir))  # untimed warm pass (JIT/codegen)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                times.append(time.perf_counter() - t0)
            out[name] = round(sorted(times)[1], 3)
        except Exception as exc:  # surface, don't abort the sweep
            out[name] = f"ERR: {type(exc).__name__}"
        spark.catalog.clearCache()
    spark.stop()
    return out


def main():
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    r01 = sweep("/root/testdata/sf0.1")
    print(json.dumps({"sf": 0.1, "queries": r01}))
    r1 = sweep(sf1_dir)
    print(json.dumps({"sf": 1.0, "queries": r1}))
    print("\n| query | sf0.1 | sf1 | ratio @10x data |")
    print("|---|---|---|---|")
    for name in r01:
        a, b = r01.get(name), r1.get(name)
        if isinstance(a, float) and isinstance(b, float) and a > 0:
            print(f"| {name} | {a} | {b} | {b / a:.1f} |")
        else:
            print(f"| {name} | {a} | {b} | - |")


if __name__ == "__main__":
    main()
