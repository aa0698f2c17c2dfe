"""Sampled validation: decide pass/fail from a deterministic slice.

At 100 TB, running every row rule over every row is often unnecessary —
a violation-RATE threshold ("null rate must stay under 0.1%") can be
decided from a small sample with an explicit confidence bound, and the
expensive part of validation (UDF rules, joins, aggregation state)
then touches only the slice.  This module provides the three pieces:

- :func:`systematic_slice` — a DETERMINISTIC sample predicate
  (``pmod(hash(key), denom) == 0``).  Unlike ``df.sample``, whose
  output depends on partitioning and row order, a hash slice is a pure
  function of the data, so results are reproducible across runs,
  engines and cluster sizes — which is also what makes it oracle-able.
- :func:`wilson_bounds` — the Wilson score interval for a binomial
  proportion as closed-form Column arithmetic.  Chosen over the normal
  approximation because it behaves at p≈0 (the regime violation rates
  live in) and over Clopper-Pearson because it is closed-form (no
  special functions → bit-identical across engines on the same
  (viol, n) integers).
- :func:`sampled_violation_report` — one scan of the slice evaluating
  every rule, unpivoted to one row per rule with the rate, the bounds
  and a three-way verdict against a threshold: ``pass`` (upper bound
  below), ``fail`` (lower bound above), ``inconclusive`` (straddles —
  the caller's cue to widen the slice or run the full scan).

Scale notes: the slice predicate is evaluated during the scan, so the
full input is still READ once (hash sampling cannot skip row groups);
the savings are everything downstream — Python/Arrow rule UDFs, shuffle
state, verdict joins all see ``1/denom`` of the data.  On tables
bucketed by the sample key the scan itself prunes to ``1/denom`` of the
buckets.  The single aggregation emits one row regardless of input
size; there is no per-key state to skew.

The reference has no sampling concept (validation is all-rows,
Relapse.hs:58-70); this is part of the §2.6 gap the north star's
constraint classes fill.
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 95% two-sided normal quantile, spelled to double precision so both
# engines fold the identical literal
Z95 = 1.959963984540054


def systematic_slice(key: Column, denom: int,
                     portable: bool = False) -> Column:
    """Deterministic 1-in-``denom`` sample predicate.

    Default hashes the key (xxhash64) so any key type/distribution
    yields a uniform slice.  ``portable=True`` uses the raw key modulus
    instead — only appropriate for keys already uniform mod ``denom``
    (dense integer ids), but reproducible in ANY engine (the DuckDB
    oracle cannot evaluate Spark's xxhash64 seed).
    """
    if portable:
        return F.pmod(key, F.lit(denom)) == 0
    return F.pmod(F.xxhash64(key), F.lit(denom)) == 0


def wilson_bounds(viol: Column, n: Column,
                  z: float = Z95) -> Tuple[Column, Column]:
    """Wilson score interval (lo, hi) for ``viol`` successes in ``n``
    trials, as closed-form double arithmetic: with p̂ = viol/n,

        center = p̂ + z²/2n,  margin = z·√(p̂(1−p̂)/n + z²/4n²)
        (lo, hi) = (center ∓ margin) / (1 + z²/n)

    All inputs are integers, every operation (+,·,/,√) is correctly
    rounded IEEE double, and the expression tree is fixed — so two
    engines computing this from the same (viol, n) produce
    bit-identical doubles.  Returns (0.0, 0.0)-degenerate NULLs guarded:
    n must be > 0 (callers filter empty slices).
    """
    nd = n.cast("double")
    p = viol.cast("double") / nd
    z2 = F.lit(z * z)
    center = p + z2 / (F.lit(2.0) * nd)
    margin = F.lit(z) * F.sqrt(
        p * (F.lit(1.0) - p) / nd + z2 / (F.lit(4.0) * nd * nd))
    denom = F.lit(1.0) + z2 / nd
    lo = F.greatest((center - margin) / denom, F.lit(0.0))
    hi = F.least((center + margin) / denom, F.lit(1.0))
    return lo, hi


def sampled_violation_report(df: DataFrame, rules: Dict[str, Column],
                             sample_pred: Column, threshold: float,
                             z: float = Z95) -> DataFrame:
    """One slice scan → per-rule (rule_id, n_sampled, n_viol, rate,
    rate_lo, rate_hi, verdict).

    ``rules`` maps rule_id → PASS Column (the checkplan
    ``compile_row_columns`` contract: error-as-false, coalesced).  The
    single aggregation computes every rule's violation count in one
    pass over the slice; the unpivot to rows is an explode over a
    literal-shaped array, so the plan stays one scan + one single-row
    aggregate regardless of rule count.

    Verdict semantics against ``threshold`` (a violation-RATE bound):
    ``pass`` if the 95% upper bound is below it, ``fail`` if the lower
    bound is above it, else ``inconclusive``.
    """
    sliced = df.filter(sample_pred)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for rid, ok in rules.items():
        aggs.append(
            F.sum((~F.coalesce(ok, F.lit(False))).cast("long"))
            .alias(f"__v_{rid}"))
    row = sliced.agg(*aggs)
    entries = [
        F.struct(F.lit(rid).alias("rule_id"),
                 F.col("__n").alias("n_sampled"),
                 F.col(f"__v_{rid}").alias("n_viol"))
        for rid in rules
    ]
    per_rule = (row.select(F.explode(F.array(*entries)).alias("e"))
                .select("e.rule_id", "e.n_sampled", "e.n_viol")
                .filter(F.col("n_sampled") > 0))
    lo, hi = wilson_bounds(F.col("n_viol"), F.col("n_sampled"), z)
    rate = F.col("n_viol").cast("double") / F.col("n_sampled").cast("double")
    out = per_rule.select(
        "rule_id", "n_sampled", "n_viol",
        rate.alias("rate"), lo.alias("rate_lo"), hi.alias("rate_hi"))
    t = F.lit(float(threshold))
    return out.withColumn(
        "verdict",
        F.when(F.col("rate_hi") < t, F.lit("pass"))
        .when(F.col("rate_lo") > t, F.lit("fail"))
        .otherwise(F.lit("inconclusive")))
