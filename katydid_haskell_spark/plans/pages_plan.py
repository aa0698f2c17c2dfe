"""The flagship check plan for the `pages` corpus — every constraint class
from BASELINE.json:north_star in one suite.

Row rules are Relapse specs (note the `.field` Contains idiom: a bare node
pattern matches a one-node forest; documents have 5+ fields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import drift as drift_ops
from ..operators.stats import StatRule
from ..sources.pages import BASE_TS, DRIFT_OFFSET_S, WINDOW_S
from .checkplan import CheckPlan, DriftRule, RefRule, RowRule, UniqueRule

TS_MIN = BASE_TS
TS_MAX = BASE_TS + WINDOW_S + DRIFT_OFFSET_S + 86400


def default_pages_plan(expect_rows: int | None = None,
                       exact_distinct: bool = False) -> CheckPlan:
    """``exact_distinct=True`` swaps the HLL url-distinct check for an
    exact COUNT(DISTINCT) — used by the oracle-gated entry query, where the
    metric must be reproducible in DuckDB (HLL estimates are
    implementation-specific).  The scale default stays approximate."""
    plan = CheckPlan(
        row_rules=[
            RowRule("url_scheme", '.url ~= "^https?://"',
                    "url must be http(s)"),
            RowRule("url_host_dot", '.url ~= "^https?://[^/]+\\\\."',
                    "url host must contain a dot"),
            RowRule("text_nonempty", ".text: -> gt(length($string), 0)",
                    "extracted text must be non-empty"),
            RowRule("lang_shape", '.lang ~= "^[a-z]{2}$"',
                    "lang must be two lowercase letters"),
            RowRule(
                "warc_ts_range",
                f".warc_ts: -> and(ge($int, {TS_MIN}), lt($int, {TS_MAX}))",
                "warc_ts within crawl window",
            ),
            RowRule("html_title", '.text ^= "Page "',
                    "extracted text starts with the title"),
        ],
        stat_rules=[
            StatRule("text_null_rate", "text", "null_rate", "le", 0.01),
            StatRule("lang_null_rate", "lang", "null_rate", "le", 0.02),
            StatRule("ts_min_in_window", "warc_ts", "min", "ge",
                     F.lit(TS_MIN).cast("timestamp")),
            StatRule("ts_max_in_window", "warc_ts", "max", "lt",
                     F.lit(TS_MAX).cast("timestamp")),
        ]
        + (
            [StatRule("url_distinct", "url",
                      "distinct" if exact_distinct else "approx_distinct",
                      "ge", int(expect_rows * 0.9))]
            if expect_rows
            else []
        ),
        unique_rules=[UniqueRule("unique_url", "url")],
        ref_rules=[RefRule("lang_in_iso639", "lang", "lang_dim", "lang_code")],
        drift_rules=[
            DriftRule(
                "text_len_drift",
                lambda: drift_ops.text_len_bucket(F.col("text"), 50),
                "text_len",
                max_value=0.2,
                metric="psi",
            ),
            DriftRule(
                "warc_ts_drift",
                lambda: drift_ops.ts_day_bucket(F.col("warc_ts")),
                "warc_ts",
                max_value=0.25,
                metric="kl",
            ),
        ],
    )
    return plan


def pages_baselines(spark: SparkSession, baseline_pages: DataFrame) -> dict:
    """Baseline histograms from an undrifted reference corpus."""
    return {
        "text_len": drift_ops.histogram(
            baseline_pages, drift_ops.text_len_bucket(F.col("text"), 50)
        ),
        "warc_ts": drift_ops.histogram(
            baseline_pages, drift_ops.ts_day_bucket(F.col("warc_ts"))
        ),
    }
