"""Input-parallelism sizing for Python-UDF-bound pipelines.

Spark sizes scan partitions by BYTES (``spark.sql.files.maxPartitionBytes``,
default 128 MB) — the right granularity for JVM codegen, and far too
coarse for Arrow-UDF compute: a 128 MB text split through a
tokenize+hash pandas UDF is minutes of single-core Python, so a small
table (or the tail of any table) that scans as a handful of splits
caps the whole map side at a handful of cores no matter how many
executors exist.  Measured on this box (25k docs in ONE 5.8 MB parquet
file = 2 splits): duplicate_spans at 8 cores ran 10.1 s as-scanned vs
5.0 s after repartition — the UDF passes were split-bound, not
compute-bound.

At crawl scale the scan yields thousands of splits and this module is
a no-op; it exists for the small-input / few-files regime, and as the
documented seam so operators themselves never shuffle text.

The conditional repartition DOES move payload bytes once — which is
why it lives in the SOURCE layer as an explicit caller choice rather
than inside the curation operators (whose plans are guarded to never
shuffle text): by construction it only fires when the input is smaller
than cores × maxPartitionBytes, i.e. when that one-time shuffle is
trivially cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def udf_parallelize(df: DataFrame, min_partitions: int | None = None
                    ) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the
    session's ``sparkContext.defaultParallelism``) iff it currently has
    fewer partitions — otherwise return it untouched (no extra
    exchange on an already-parallel scan)."""
    target = (min_partitions
              if min_partitions is not None
              else df.sparkSession.sparkContext.defaultParallelism)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
