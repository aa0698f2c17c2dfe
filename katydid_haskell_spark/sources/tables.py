"""Table IO abstraction: Iceberg when a catalog is configured, parquet +
manifest otherwise (SURVEY.md §7.3.7).

The north rule's resume contract needs two capabilities from the storage
layer: (a) bucketed layout by url-hash, (b) a *snapshot identity* for the
input so a resumed run can tell whether its manifest still applies.

- With an Iceberg catalog on the classpath (`spark.sql.catalog.<name>`
  configured), `write_bucketed` uses `writeTo(...).partitionedBy(bucket(...))`
  and `snapshot_id` reads the current Iceberg snapshot.
- Without one (this sandbox), the same contract is provided by parquet
  partitioned by an explicit bucket column plus a `_table_manifest.json`
  carrying a deterministic content fingerprint as the snapshot id.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_table_manifest.json"


def iceberg_catalog(spark: SparkSession) -> Optional[str]:
    """Name of a configured Iceberg catalog, or None."""
    try:
        items = spark.sparkContext.getConf().getAll()
    except Exception:
        return None
    for k, v in items:
        if k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower():
            return k.split(".", 3)[3].split(".")[0]
    return None


def content_fingerprint(df: DataFrame, key_col: str) -> int:
    """Order-insensitive 64-bit fingerprint of the table content (xor-free
    sum of per-row key hashes) — the parquet-mode snapshot id."""
    row = df.agg(
        F.sum(F.xxhash64(key_col) % F.lit(1 << 40)).alias("fp"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return hash((row["fp"], row["n"])) & ((1 << 63) - 1)


def write_bucketed(df: DataFrame, target: str, bucket_col: str = "bucket",
                   buckets: int = 16, key_col: str = "url") -> str:
    """Write the corpus in bucketed layout; returns the snapshot id."""
    spark = df.sparkSession
    cat = iceberg_catalog(spark)
    if cat is not None and not target.startswith("/"):
        (
            df.writeTo(f"{cat}.{target}")
            .using("iceberg")
            .partitionedBy(F.bucket(buckets, key_col))
            .createOrReplace()
        )
        return str(snapshot_id(spark, target))
    (
        df.repartition(bucket_col)
        .write.mode("overwrite")
        .partitionBy(bucket_col)
        .parquet(target)
    )
    snap = str(content_fingerprint(spark.read.parquet(target), key_col))
    with open(os.path.join(target, MANIFEST), "w") as f:
        json.dump({"snapshot": snap, "written_at": time.time(),
                   "buckets": buckets, "key": key_col}, f)
    return snap


def write_bucketed_table(df: DataFrame, name: str, key_col: str,
                         buckets: int, path: Optional[str] = None,
                         sort: bool = True) -> None:
    """TRUE Spark bucketing: ``bucketBy(buckets, key).sortBy(key)``
    through ``saveAsTable`` (bucket metadata lives in the catalog, which
    is why this needs a table name, unlike the path-partitioned layout
    of :func:`write_bucketed`).

    The payoff is CO-LOCATED JOINS: two tables bucketed on the same key
    with the same bucket count equi-join with NO shuffle exchange on
    either side — each task reads bucket i of both tables — and with
    ``sort=True`` the sort-merge join's per-side Sort is elided too.
    At 100 TB this turns the dominant fact-fact join cost (a full
    two-sided shuffle) into a scan, amortized once at write time; the
    same layout makes single-key lookups prune to one bucket.
    ``path`` makes the table external (data at ``path``, metadata in
    the session catalog).
    """
    w = (df.write.mode("overwrite")
         .bucketBy(buckets, key_col))
    if sort:
        w = w.sortBy(key_col)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def read_table(spark: SparkSession, target: str) -> DataFrame:
    cat = iceberg_catalog(spark)
    if cat is not None and not target.startswith("/"):
        return spark.read.table(f"{cat}.{target}")
    return spark.read.parquet(target)


def snapshot_id(spark: SparkSession, target: str) -> Optional[str]:
    cat = iceberg_catalog(spark)
    if cat is not None and not target.startswith("/"):
        row = spark.sql(
            f"SELECT snapshot_id FROM {cat}.{target}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(row[0][0]) if row else None
    path = os.path.join(target, MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return str(json.load(f).get("snapshot"))
