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

# NULL keys are coalesced to this sentinel in BOTH heavy_hitters modes so a
# null-heavy column produces the same verdict regardless of approx=True/False
# (the approx path reserves the real NULL as its per-batch total row, and
# pandas value_counts(dropna=True) would otherwise drop nulls entirely).
NULL_KEY = "\x00<null>"


def host_of(url: Column) -> Column:
    return F.regexp_extract(url, HOST_RE, 1)


def with_host(df: DataFrame, url_col: str = "url",
              host_col: str = "host") -> DataFrame:
    return df.withColumn(host_col, host_of(F.col(url_col)))


def heavy_hitters(df: DataFrame, key: Column, min_fraction: float = 0.01,
                  approx: bool = True) -> DataFrame:
    """Keys holding more than min_fraction of all rows → (key, cnt).

    ONE scan either way; the total row count comes out of the same pass
    (never a second ``df.count()`` job).  NULL keys are reported under the
    :data:`NULL_KEY` sentinel — identically in both modes.

    ``approx=False`` — exact: full ``groupBy(key).count()`` histogram, then
    the (tiny, pre-aggregated) histogram is re-aggregated for the total and
    filtered.  The shuffle carries the full key histogram: exact, but at
    10^12 rows with ~10^9 hosts that is a large shuffle.

    ``approx=True`` — candidate pre-filter: an Arrow batch-level
    ``value_counts`` keeps only keys that are *locally* heavy
    (local share ≥ min_fraction/2) plus one null-key total row per batch,
    so the shuffle carries candidates only.  A key with global share ≥ f
    must have local share ≥ f in some batch (weighted-average argument), so
    every true heavy hitter is emitted somewhere; reported counts are lower
    bounds (contributions from batches where the key fell under the local
    threshold are lost), so keys within that slack of the threshold may be
    missed.  That is the standard sketch trade-off — use it to drive
    salting decisions, not for exact frequency reporting.

    Precise bound: a global-share-≥f key is always a CANDIDATE; it
    survives the final filter iff its mass in the batches where it is
    locally ≥ f/2 is itself ≥ f·N.  That holds whenever batches are
    statistically alike (hash-shuffled input) and can only fail under
    adversarial per-batch skew that straddles the f/2 line.  Property
    test at 100k Zipf rows × two partitionings:
    ``test_heavy_hitters_approx_property_zipf_100k`` (completeness +
    per-key lower-bound soundness).
    """
    if not approx:
        # key is cast to string in both paths (the approx path's Arrow
        # value_counts round-trips through strings) so callers get one
        # stable output schema regardless of mode; NULL keys become
        # NULL_KEY in both so the modes agree on null-heavy columns
        counted = df.groupBy(
            F.coalesce(key.cast("string"), F.lit(NULL_KEY)).alias("key")
        ).agg(
            F.count(F.lit(1)).alias("cnt"))
        tot = counted.agg(F.sum("cnt").alias("__total"))
        return (counted.crossJoin(F.broadcast(tot))
                .filter(F.col("cnt") >= F.col("__total") * min_fraction)
                .drop("__total"))

    import pandas as pd

    local_frac = min_fraction / 2.0

    def batch_counts(batches):
        for b in batches:
            s = b["key"]
            n = len(s)
            if n == 0:
                continue
            vc = s.fillna(NULL_KEY).value_counts(dropna=True)
            cand = vc[vc >= max(1.0, n * local_frac)]
            out = pd.DataFrame({
                "key": cand.index.astype(str),
                "cnt": cand.to_numpy(dtype="int64"),
            })
            # one sentinel row per batch carries the batch size, so the
            # global total falls out of the same aggregation
            out = pd.concat([out, pd.DataFrame(
                {"key": [None], "cnt": [n]})], ignore_index=True)
            yield out

    keyed = df.select(
        F.coalesce(key.cast("string"), F.lit(NULL_KEY)).alias("key"))
    partial = keyed.mapInPandas(batch_counts, "key string, cnt long")
    agg = partial.groupBy("key").agg(F.sum("cnt").alias("cnt"))
    tot = (agg.filter(F.col("key").isNull())
           .agg(F.sum("cnt").alias("__total")))
    return (agg.filter(F.col("key").isNotNull())
            .crossJoin(F.broadcast(tot))
            .filter(F.col("cnt") >= F.col("__total") * min_fraction)
            .drop("__total"))


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
