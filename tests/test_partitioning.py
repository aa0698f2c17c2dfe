"""udf_parallelize: conditional input-parallelism sizing for
Arrow-UDF-bound pipelines (no-op on already-parallel inputs)."""

from katydid_haskell_spark.sources.partitioning import udf_parallelize


def test_upsizes_single_partition(spark):
    df = spark.range(1000).coalesce(1)
    out = udf_parallelize(df, min_partitions=8)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 1000


def test_noop_when_already_parallel(spark):
    df = spark.range(1000).repartition(8)
    out = udf_parallelize(df, min_partitions=4)
    assert out is df  # untouched — no extra exchange


def test_default_target_is_session_parallelism(spark):
    df = spark.range(100).coalesce(1)
    out = udf_parallelize(df)
    assert (out.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)
