"""Referential-integrity constraints (SURVEY.md §2.6).

Foreign-key containment via **broadcast left-anti join**: the dimension side
(e.g. ~180 ISO-639 codes) broadcasts to every executor, so the check is a
map-only pass over the fact table — zero shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_rows(fact: DataFrame, fk: str, dim: DataFrame,
                dim_key: str) -> DataFrame:
    """Fact rows whose fk has no match in the dimension (NULL fk counts as
    an orphan, matching strict FK semantics for required references)."""
    matched = fact.join(
        F.broadcast(dim.select(F.col(dim_key).alias(fk)).distinct()),
        on=fk,
        how="left_anti",
    )
    return matched


def referential_violations(fact: DataFrame, fk: str, dim: DataFrame,
                           dim_key: str, key_col: str = "url",
                           rule_id: str = "lang_in_iso639") -> DataFrame:
    return orphan_rows(fact, fk, dim, dim_key).select(
        F.col(key_col).cast("string").alias("url"),
        F.lit(rule_id).alias("rule_id"),
        F.concat(F.lit(f"{fk}="),
                 F.coalesce(F.col(fk).cast("string"), F.lit("NULL")),
                 F.lit(" not in dimension")).alias("detail"),
    )


def referential_verdict(fact: DataFrame, fk: str, dim: DataFrame,
                        dim_key: str, rule_id: str = "lang_in_iso639") -> DataFrame:
    agg = orphan_rows(fact, fk, dim, dim_key).agg(
        F.count(F.lit(1)).alias("orphans")
    )
    return agg.select(
        F.lit(rule_id).alias("rule_id"),
        F.lit("table").alias("scope"),
        (F.col("orphans") == 0).alias("pass"),
        F.col("orphans").cast("double").alias("metric"),
        F.concat(F.lit("orphan rows="), F.col("orphans")).alias("detail"),
    )
