"""Benchmark harness: headline queries + validation throughput.

Prints ONE JSON line:
  {"metric": "headline_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "pages_docs_per_sec": D, "pages_rows": R}

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_SCALING=1     → additionally run the pages validation job at
                        local[8] and local[32] in subprocesses and append
                        the scaling table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time


def _force(df) -> None:
    """Force full evaluation without a materializing sink."""
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


HEADLINE = [
    "relapse_filter_docs",
    "relapse_validate_rate",
    "relapse_props_json",
    "stats_orders_profile",
    "unique_dup_custkeys",
    "referential_orphans",
    "drift_psi_events",
    "tpch_q1",
    "top_orders_per_cust",
    "revenue_by_nation",
    "events_hourly",
    "token_counts",
    "doc_quality",
    "doc_lang_id",
    "doc_fingerprint",
    "ann_topk_brute",
    "minhash_pairs",
    "simhash_pairs",
    "lsh_topk",
    "ann_topk_ivf",
    "embedding_neardup",
    "q6_revenue",
    "rollup_lineitem",
    "top10_customers",
    "set_ops_customers",
    "sessionize_events",
]


def pages_throughput(spark, n_rows: int, warmup: bool = False) -> float:
    """Full constraint suite (row + table rules) over n_rows pages →
    docs/sec validated.  Input is materialized (cached + counted) first so
    the timing measures validation, not generation.

    ``warmup=True`` runs the suite once untimed first: JVM JIT + codegen
    warm-up dominates a single cold run (measured up to 3x), so scaling
    comparisons use steady-state timings."""
    from pyspark.sql import functions as F

    from katydid_haskell_spark.plans.pages_plan import (
        default_pages_plan,
        pages_baselines,
    )
    from katydid_haskell_spark.plans.runner import run_plan
    from katydid_haskell_spark.sources.pages import (
        lang_dim_df,
        pages_df,
        with_bucket,
    )

    pages = with_bucket(pages_df(spark, n_rows)).persist()
    pages.count()  # materialize outside the timed window
    plan = default_pages_plan(expect_rows=n_rows)
    baselines = {
        k: v.persist()
        for k, v in pages_baselines(
            spark, pages_df(spark, max(n_rows // 10, 1000), drifted=False)
        ).items()
    }
    for b in baselines.values():
        b.count()
    if warmup:
        warm = run_plan(pages, plan, {"lang_dim": lang_dim_df(spark)},
                        baselines, snapshot="warmup")
        _force(warm.verdicts)
        _force(warm.violations)
    t0 = time.perf_counter()
    res = run_plan(pages, plan, {"lang_dim": lang_dim_df(spark)}, baselines,
                   snapshot="bench")
    _force(res.verdicts)
    _force(res.violations)
    dt = time.perf_counter() - t0
    pages.unpersist()
    return n_rows / dt, dt


def run_bench() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    # latency-bound local benchmark: AQE's per-stage barriers off (see
    # BENCH/BASELINE.md methodology), shuffle partitions sized to data
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    from katydid_haskell_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench", cores=cpus, shuffle_partitions=min(2 * cpus, 32))
    qs = entry_mod.queries()

    # untimed warmup: first job pays session + executor + codegen startup,
    # and the first pandas UDF pays the Python worker-pool spin-up — both
    # are session costs, not query costs
    _force(spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag").count())
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(x):
        return x

    _force(spark.range(0, 10_000, numPartitions=cpus).select(_warm("id")))

    per_query = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        per_query[name] = round(time.perf_counter() - t0, 3)
        # operators that persist() intermediates (minhash features, dup
        # keys) would otherwise accumulate heap across queries and skew
        # later timings via GC pressure
        spark.catalog.clearCache()

    n_pages = max(int(1_000_000 * sf), 2000)
    docs_per_sec, pages_sec = pages_throughput(spark, n_pages, warmup=True)
    per_query["pages_validation"] = round(pages_sec, 3)

    total = round(sum(per_query.values()), 3)
    out = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "pages_docs_per_sec": round(docs_per_sec),
        "pages_rows": n_pages,
    }
    spark.stop()
    return out


def scaling_child(cores: int) -> None:
    """Run only the pages throughput job on local[cores]; print JSON."""
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    # Fair N-vs-4N comparison: ONLY core count varies.  Shuffle partitions
    # are fixed (32 covers both waves), and AQE is off because its
    # per-stage re-planning barriers add constant driver latency that
    # swamps second-scale stages (measured: 31s→7s at local[32]); on a
    # real cluster with minute-scale stages AQE stays on (session default).
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    from katydid_haskell_spark.session import get_spark

    # compute-dominated input so fixed costs (session + codegen) don't mask
    # the scaling signal; overridable for quick runs
    n_pages = int(os.environ.get("BENCH_SCALING_ROWS", "1000000"))
    spark = get_spark(f"bench-scaling-{cores}", cores=cores,
                      shuffle_partitions=32)
    dps, sec = pages_throughput(spark, n_pages, warmup=True)
    spark.stop()
    print(json.dumps({"cores": cores, "docs_per_sec": round(dps), "sec": round(sec, 3),
                      "rows": n_pages}))


def run_scaling() -> None:
    results = {}
    for cores in (8, 32):
        p = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cores)],
            capture_output=True, text=True, cwd=os.path.dirname(__file__) or ".",
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    t8, t32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = t32 / (4 * t8)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — scaling efficiency (north rule: >= 0.8 from N to 4N)\n\n"
            "Same job (full pages constraint suite: 6 relapse row rules with "
            "fused per-bucket rollup, stats, uniqueness, referential, 2 drift "
            "checks, violations sink), same 1M-row input, two parallelism "
            "levels. This sandbox has no multi-node cluster, so per "
            "BASELINE.md the two-cluster-size criterion is evidenced as "
            "local[8] vs local[32] = N vs 4N cores.\n\n"
            "Methodology: each measurement is a fresh process; the suite runs "
            "once untimed (JVM JIT + codegen warm-up dominates a single cold "
            "run — measured up to 3x variance), then the timed steady-state "
            "pass. Input is generated + cached before timing, so the number "
            "is validation throughput. Identical config on both runs "
            "(shuffle partitions fixed at 32; AQE off for the measurement "
            "because its per-stage re-planning barriers add constant driver "
            "latency that swamps second-scale local stages — on a real "
            "cluster with minute-scale stages AQE stays on, see session.py).\n\n"
            "| config | rows | sec | docs/sec |\n|---|---|---|---|\n"
            f"| local[8]  | {results[8]['rows']} | {results[8]['sec']} | {t8} |\n"
            f"| local[32] | {results[32]['rows']} | {results[32]['sec']} | {t32} |\n\n"
            f"**Scaling efficiency** T(4N)/(4·T(N)) = {eff:.3f}\n"
        )
    print(json.dumps({"scaling_efficiency": round(eff, 3), "local8": results[8],
                      "local32": results[32]}))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--scaling-child":
        scaling_child(int(sys.argv[2]))
    elif os.environ.get("BENCH_SCALING") == "1" or (
        len(sys.argv) > 1 and sys.argv[1] == "--scaling"
    ):
        run_scaling()
    else:
        print(json.dumps(run_bench()))
