"""CheckPlan: a compiled suite of constraint rules over one table.

The Spark lifecycle from SURVEY.md §3: Relapse-style specs + table-level
constraint classes compile on the driver into a plan of

  - **row rules** — Relapse specs lowered to boolean Catalyst Columns
    (:mod:`..relapse.lower`), ALL evaluated in a single scan, with a fused
    per-bucket rollup (one partial+final aggregation) and a violations
    explode from the same pass;
  - **table rules** — stats (one fused agg), uniqueness (key shuffle),
    referential integrity (broadcast anti-join), drift (histogram + tiny
    broadcast join).

Sinks (FIXTURES.md §6):
  violations: url string, rule_id string, detail string
  verdicts:   bucket_id int, rule_id string, pass boolean, metric double,
              rows_checked long, snapshot string
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import drift as drift_ops
from ..operators import referential as ref_ops
from ..operators import stats as stats_ops
from ..operators import uniqueness as uniq_ops
from ..relapse import parser as relapse_parser
from ..relapse.lower import LoweringUnsupported, compile_to_column
from ..relapse.smart import compile_grammar

TABLE_SCOPE_BUCKET = -1


@dataclass(frozen=True)
class RowRule:
    """A Relapse spec evaluated per row (lowered to a Catalyst Column)."""

    rule_id: str
    spec: str
    detail: str = ""


@dataclass(frozen=True)
class UniqueRule:
    rule_id: str
    key: str


@dataclass(frozen=True)
class RefRule:
    rule_id: str
    fk: str
    dim_name: str  # key into the dims dict passed at run time
    dim_key: str


@dataclass(frozen=True)
class DriftRule:
    rule_id: str
    bucketizer: Callable[[], Column]  # () -> bucket Column over the table
    baseline_name: str  # key into the baselines dict passed at run time
    max_value: float = 0.2
    metric: str = "psi"


@dataclass
class CheckPlan:
    row_rules: List[RowRule] = field(default_factory=list)
    stat_rules: List[stats_ops.StatRule] = field(default_factory=list)
    unique_rules: List[UniqueRule] = field(default_factory=list)
    ref_rules: List[RefRule] = field(default_factory=list)
    drift_rules: List[DriftRule] = field(default_factory=list)

    def compile_row_columns(self, schema) -> Dict[str, Column]:
        """Lower every row rule against the schema — driver-side compile,
        mirrors Smart.compile + derivative unrolling."""
        out: Dict[str, Column] = {}
        for r in self.row_rules:
            g = compile_grammar(relapse_parser.parse_grammar(r.spec))
            out[r.rule_id] = compile_to_column(g, schema)
        return out


def run_row_rules(df: DataFrame, plan: CheckPlan, key_col: str = "url",
                  bucket_col: str = "bucket",
                  snapshot: str = "na") -> tuple:
    """ONE pass over the table: all row rules as boolean columns.

    Returns (verdicts, violations). The rollup aggregates per bucket
    (partial+final — the shuffle carries one row per bucket per task);
    violations are exploded from the same cached projection.
    """
    rules = plan.row_rules
    if not rules:
        return None, None
    cols = plan.compile_row_columns(df.schema)
    checked = df.select(
        F.col(key_col).alias("__key"),
        F.col(bucket_col).alias("__bucket"),
        *[cols[r.rule_id].alias(f"ok_{i}") for i, r in enumerate(rules)],
    )
    aggs = [F.count(F.lit(1)).alias("rows_checked")]
    for i, _ in enumerate(rules):
        aggs.append(F.sum(F.col(f"ok_{i}").cast("long")).alias(f"npass_{i}"))
    rolled = checked.groupBy("__bucket").agg(*aggs)
    verdict_structs = [
        F.struct(
            F.col("__bucket").cast("int").alias("bucket_id"),
            F.lit(r.rule_id).alias("rule_id"),
            (F.col(f"npass_{i}") == F.col("rows_checked")).alias("pass"),
            (F.col(f"npass_{i}") / F.col("rows_checked"))
            .cast("double").alias("metric"),
            F.col("rows_checked").cast("long").alias("rows_checked"),
            F.lit(snapshot).alias("snapshot"),
        )
        for i, r in enumerate(rules)
    ]
    verdicts = rolled.select(
        F.explode(F.array(*verdict_structs)).alias("v")
    ).select("v.*")

    viol_structs = [
        F.when(
            ~F.coalesce(F.col(f"ok_{i}"), F.lit(False)),
            F.struct(
                F.lit(r.rule_id).alias("rule_id"),
                F.lit(r.detail or r.spec).alias("detail"),
            ),
        )
        for i, r in enumerate(rules)
    ]
    violations = (
        checked.select(
            F.col("__key"),
            F.array_compact(F.array(*viol_structs)).alias("fails"),
        )
        .filter(F.size("fails") > 0)
        .select(F.col("__key"), F.explode("fails").alias("f"))
        .select(
            F.col("__key").cast("string").alias("url"),
            F.col("f.rule_id").alias("rule_id"),
            F.col("f.detail").alias("detail"),
        )
    )
    return verdicts, violations


def run_table_rules(df: DataFrame, plan: CheckPlan,
                    dims: Dict[str, DataFrame],
                    baselines: Dict[str, DataFrame],
                    key_col: str = "url",
                    snapshot: str = "na") -> tuple:
    """Table-scope rules → (verdicts, violations)."""
    verdict_frames: List[DataFrame] = []
    violation_frames: List[DataFrame] = []
    n_rows_col = F.lit(None).cast("long")

    if plan.stat_rules:
        verdict_frames.append(stats_ops.run_stat_rules(df, plan.stat_rules))
    for r in plan.unique_rules:
        # persist the (small) duplicate-key aggregate: the verdict rollup
        # and the violations listing both consume it — one shuffle, not two
        dups = uniq_ops.duplicate_keys(df, [r.key]).persist()
        verdict_frames.append(
            dups.agg(
                F.count(F.lit(1)).alias("dup_keys"),
                F.coalesce(F.sum("dup_count"), F.lit(0)).alias("dup_rows"),
            ).select(
                F.lit(r.rule_id).alias("rule_id"),
                F.lit("table").alias("scope"),
                (F.col("dup_keys") == 0).alias("pass"),
                F.col("dup_keys").cast("double").alias("metric"),
                F.concat(F.lit("duplicate keys="), F.col("dup_keys"),
                         F.lit(" rows in duplicates="), F.col("dup_rows"),
                         ).alias("detail"),
            )
        )
        violation_frames.append(
            dups.select(
                F.col(r.key).cast("string").alias("url"),
                F.lit(r.rule_id).alias("rule_id"),
                F.concat(F.lit("duplicate count="), F.col("dup_count"),
                         ).alias("detail"),
            )
        )
    for r in plan.ref_rules:
        dim = dims[r.dim_name]
        orphans = ref_ops.orphan_rows(df, r.fk, dim, r.dim_key).persist()
        verdict_frames.append(
            orphans.agg(F.count(F.lit(1)).alias("orphans")).select(
                F.lit(r.rule_id).alias("rule_id"),
                F.lit("table").alias("scope"),
                (F.col("orphans") == 0).alias("pass"),
                F.col("orphans").cast("double").alias("metric"),
                F.concat(F.lit("orphan rows="), F.col("orphans")).alias("detail"),
            )
        )
        violation_frames.append(
            orphans.select(
                F.col(key_col).cast("string").alias("url"),
                F.lit(r.rule_id).alias("rule_id"),
                F.concat(F.lit(f"{r.fk}="),
                         F.coalesce(F.col(r.fk).cast("string"), F.lit("NULL")),
                         F.lit(" not in dimension")).alias("detail"),
            )
        )
    for r in plan.drift_rules:
        cur = drift_ops.histogram(df, r.bucketizer())
        verdict_frames.append(
            drift_ops.drift_verdict(cur, baselines[r.baseline_name],
                                    r.rule_id, r.max_value, r.metric)
        )

    verdicts = None
    if verdict_frames:
        v = verdict_frames[0]
        for x in verdict_frames[1:]:
            v = v.unionByName(x)
        verdicts = v.select(
            F.lit(TABLE_SCOPE_BUCKET).alias("bucket_id"),
            "rule_id",
            "pass",
            "metric",
            F.lit(None).cast("long").alias("rows_checked"),
            F.lit(snapshot).alias("snapshot"),
        )
    violations = None
    if violation_frames:
        violations = violation_frames[0]
        for x in violation_frames[1:]:
            violations = violations.unionByName(x)
    return verdicts, violations


def topk_violations(violations: DataFrame, k: int = 20) -> DataFrame:
    """At most k example violations per rule (deterministic by url order).

    One shuffle partitioned by rule_id; at scale the violations frame can
    be arbitrarily large, so example reporting must bound it before any
    collect/sink — this is that bound.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("rule_id").orderBy(F.asc("url"), F.asc("detail"))
    return (
        violations.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )
