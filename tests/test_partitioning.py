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


def test_scan_pushdown_and_column_pruning(spark):
    """The declarative-plan dividend, pinned: q6's lineitem scan reads
    ONLY the four referenced columns (of 11) and carries non-empty
    pushed filters — a scan that read every column for a 4-column
    aggregate would be a plan regression."""
    import re

    import __spark_entry__ as entry_mod

    q = entry_mod.queries()["q6_revenue"](spark, "/root/testdata/sf0.001")
    plan = q._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scans, plan
    m = re.search(r"FileScan parquet \[([^\]]*)\]", scans[0])
    cols = {c.split("#")[0] for c in m.group(1).split(",")}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount",
                    "l_shipdate"}, cols
    assert "PushedFilters: []" not in scans[0]
    assert "PushedFilters: [" in scans[0] or "DataFilters: [is" in scans[0]
