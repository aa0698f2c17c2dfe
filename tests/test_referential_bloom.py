"""Bloom-mode referential check (operators/referential.py): one-sided
definite-orphan detection with zero fact shuffle — the analogue of the
approx heavy-hitter mode, property-gated (never swapped into the
exactly-oracled referential query)."""

from pyspark.sql import functions as F

from katydid_haskell_spark.operators.referential import (
    build_key_bloom,
    orphan_rows,
    orphan_rows_bloom,
)


def _fixture(spark, n_dim=2000, n_fact=3000):
    # dim keys 0..n_dim-1; fact references half in-range, half orphans
    dim = spark.range(0, n_dim).select(F.col("id").alias("dk"))
    fact = spark.range(0, n_fact).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 2 == 0, F.col("id") % n_dim)
        .otherwise(F.col("id") + 1_000_000).alias("fk"))
    return dim, fact


def test_no_false_orphans_and_coverage(spark):
    dim, fact = _fixture(spark)
    true_orphans = {r["row_id"] for r in
                    orphan_rows(fact, "fk", dim, "dk").collect()}
    got = {r["row_id"] for r in
           orphan_rows_bloom(fact, "fk", dim, "dk").collect()}
    # one-sided: every reported orphan is real
    assert got <= true_orphans
    # ~10 bits/key, k=5 -> eps ~1%; deterministic hashes make this exact
    # for the fixture, with headroom to 95%
    assert len(got) >= 0.95 * len(true_orphans)
    assert len(true_orphans) == 1500


def test_present_keys_never_flagged(spark):
    dim, _ = _fixture(spark)
    fact = spark.range(0, 5000).select(
        F.col("id").alias("row_id"), (F.col("id") % 2000).alias("fk"))
    assert orphan_rows_bloom(fact, "fk", dim, "dk").count() == 0


def test_null_fk_is_definite_orphan(spark):
    dim, _ = _fixture(spark, n_dim=100)
    fact = spark.createDataFrame(
        [(1, None), (2, 5)], "row_id long, fk long")
    got = [r["row_id"] for r in
           orphan_rows_bloom(fact, "fk", dim, "dk").collect()]
    assert got == [1]


def test_bloom_build_is_bounded_and_probe_shuffle_free(spark):
    dim, fact = _fixture(spark)
    arr, b, k = build_key_bloom(dim, "dk")
    # driver state is exactly m/64 words, sized ~bits_per_key * n
    assert len(arr) == (1 << b) >> 6
    assert (1 << b) <= 64 * 2000 * 10  # sanity: not oversized
    plan = (orphan_rows_bloom(fact, "fk", dim, "dk")
            ._jdf.queryExecution().executedPlan().toString())
    # the fact side is scan -> Arrow probe -> filter: no exchange at all
    assert "Exchange" not in plan, plan
