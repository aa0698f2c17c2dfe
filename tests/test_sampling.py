"""Sampled validation (operators/sampling.py): Wilson-bound math,
deterministic slicing, report semantics, and plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from katydid_haskell_spark.operators.sampling import (
    Z95,
    sampled_violation_report,
    systematic_slice,
    wilson_bounds,
)


def _wilson_py(v, n, z=Z95):
    p = v / n
    z2 = z * z
    center = p + z2 / (2.0 * n)
    margin = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    den = 1.0 + z2 / n
    return (max((center - margin) / den, 0.0),
            min((center + margin) / den, 1.0))


@pytest.mark.parametrize("v,n", [(0, 175), (1, 17), (50, 100),
                                 (99, 100), (100, 100), (0, 1)])
def test_wilson_matches_reference_formula(spark, v, n):
    df = spark.range(1).select(F.lit(v).alias("v"), F.lit(n).alias("n"))
    lo, hi = wilson_bounds(F.col("v"), F.col("n"))
    row = df.select(lo.alias("lo"), hi.alias("hi")).collect()[0]
    want_lo, want_hi = _wilson_py(v, n)
    # bit-identical: same fixed tree of correctly-rounded double ops
    assert row["lo"] == want_lo and row["hi"] == want_hi
    assert 0.0 <= row["lo"] <= v / n <= row["hi"] <= 1.0


def test_wilson_interval_shrinks_with_n(spark):
    df = spark.range(1)
    widths = []
    for n in (10, 100, 10_000):
        lo, hi = wilson_bounds(F.lit(n // 10), F.lit(n))
        r = df.select(lo.alias("lo"), hi.alias("hi")).collect()[0]
        widths.append(r["hi"] - r["lo"])
    assert widths[0] > widths[1] > widths[2]


def test_systematic_slice_is_partition_invariant(spark):
    df = spark.range(0, 5_000).withColumnRenamed("id", "k")
    pred = systematic_slice(F.col("k"), 7)
    a = sorted(r["k"] for r in df.filter(pred).collect())
    b = sorted(r["k"] for r in
               df.repartition(13).filter(pred).collect())
    assert a == b and len(a) > 0
    # portable variant selects exactly the modulus slice
    c = sorted(r["k"] for r in
               df.filter(systematic_slice(F.col("k"), 7, portable=True))
               .collect())
    assert c == list(range(0, 5_000, 7))


def test_report_counts_and_verdicts(spark):
    # 300 rows, slice = ids % 3 == 0 (100 rows); rule "pos" fails for
    # id % 30 == 0 within the slice -> 10/100; rule "all_ok" never fails;
    # rule "all_bad" always fails
    df = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 30 != 0).alias("pos_ok"))
    rules = {
        "pos": F.col("pos_ok"),
        "all_ok": F.lit(True),
        "all_bad": F.lit(False),
    }
    rep = sampled_violation_report(
        df, rules, systematic_slice(F.col("id"), 3, portable=True),
        threshold=0.05).collect()
    by = {r["rule_id"]: r for r in rep}
    assert by["pos"]["n_sampled"] == 100 and by["pos"]["n_viol"] == 10
    lo, hi = _wilson_py(10, 100)
    assert by["pos"]["rate_lo"] == lo and by["pos"]["rate_hi"] == hi
    assert by["pos"]["verdict"] == "fail"          # lo ~0.055 > 0.05
    assert by["all_ok"]["verdict"] == "pass"       # hi ~0.037 < 0.05
    assert by["all_bad"]["verdict"] == "fail"
    # error-as-false: a NULL rule column counts as a violation
    rep2 = sampled_violation_report(
        df, {"nullrule": F.lit(None).cast("boolean")},
        systematic_slice(F.col("id"), 3, portable=True), 0.05).collect()
    assert rep2[0]["n_viol"] == 100


def test_report_empty_slice_is_empty(spark):
    df = spark.range(0, 10)
    rep = sampled_violation_report(
        df, {"r": F.lit(True)}, F.lit(False), 0.05)
    assert rep.count() == 0


def test_report_plan_is_one_scan_no_python(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 2 == 0).alias("ok"))
    rep = sampled_violation_report(
        df, {"a": F.col("ok"), "b": ~F.col("ok")},
        systematic_slice(F.col("id"), 3), 0.05)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
    # single-row aggregate: one partial/final exchange pair at most
    assert plan.count("Exchange") <= 2
