"""Skew handling: host extraction, heavy-hitter detection, salting.

Web corpora are Zipf-skewed by host (a few hosts dominate).  Three tools:

- :func:`with_host` — host key extraction (pure Catalyst regexp).
- :func:`heavy_hitters` — find keys above a frequency threshold with one
  cheap aggregate (drive salting decisions from data, not guesses).
- :func:`salted_join` — replicate the small side S× and scatter the skewed
  fact side across salts, so one reducer no longer owns a hot key.
- :func:`two_phase_agg` — salt → partial agg → final agg, for aggregations
  whose per-key state is large (collect_set/exact distinct), where Spark's
  built-in map-side combine isn't enough.

AQE's skew-join splitting (enabled in session.py) covers sort-merge joins
automatically; these are for the cases AQE can't see (aggregations, and
broadcast-ineligible dimension joins).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOST_RE = r"^[a-z]+://([^/:?#]+)"


def host_of(url: Column) -> Column:
    return F.regexp_extract(url, HOST_RE, 1)


def with_host(df: DataFrame, url_col: str = "url",
              host_col: str = "host") -> DataFrame:
    return df.withColumn(host_col, host_of(F.col(url_col)))


def heavy_hitters(df: DataFrame, key: Column, min_fraction: float = 0.01,
                  approx: bool = True) -> DataFrame:
    """Keys holding more than min_fraction of all rows → (key, cnt).

    One partial+final count aggregate; with ``approx`` the candidate set is
    pre-filtered per partition so the shuffle only carries keys that are
    locally heavy (at 10^12 rows the full key histogram never shuffles).
    """
    counted = df.groupBy(key.alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    total = df.count()
    return counted.filter(F.col("cnt") >= F.lit(int(total * min_fraction)))


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic per-row salt (monotonically distributed, no RNG state)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 8) -> DataFrame:
    """Skew-resistant equi-join: fact rows get a salt, the dim side is
    replicated n_salts× so every (key, salt) partition finds its match.

    Use when the dim is too big to broadcast and the fact key is skewed.
    """
    salted_fact = with_salt(fact, n_salts)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    replicated_dim = dim.select("*", salts)
    out = salted_fact.join(replicated_dim, [key, "__salt"])
    return out.drop("__salt")


def two_phase_agg(df: DataFrame, group_cols: Sequence[str], agg_col: str,
                  n_salts: int = 16) -> DataFrame:
    """Exact distinct count per group via salt → partial distinct → merge.

    Per-key state is bounded by 1/n_salts of the key's rows in phase one;
    phase two merges tiny partial counts.  (HLL sketches are the cheaper
    approximate alternative — stats.hll_bucket_sketches.)
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(agg_col)), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.countDistinct(agg_col).alias("partial_distinct")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("partial_distinct").alias("distinct_count")
    )
