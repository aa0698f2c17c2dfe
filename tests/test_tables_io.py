"""Table IO abstraction: parquet-mode snapshot contract (Iceberg absent here)."""

from katydid_haskell_spark.sources.pages import pages_df, with_bucket
from katydid_haskell_spark.sources.tables import (
    iceberg_catalog,
    read_table,
    snapshot_id,
    write_bucketed,
)


def test_parquet_snapshot_roundtrip(spark, tmp_path):
    assert iceberg_catalog(spark) is None  # sandbox has no Iceberg jars
    target = str(tmp_path / "pages_tbl")
    df = with_bucket(pages_df(spark, 500), buckets=4)
    snap = write_bucketed(df, target, buckets=4)
    assert snap == snapshot_id(spark, target)
    back = read_table(spark, target)
    assert back.count() == 500
    assert "bucket" in back.columns
    # same content → same snapshot id (deterministic fingerprint)
    target2 = str(tmp_path / "pages_tbl2")
    snap2 = write_bucketed(with_bucket(pages_df(spark, 500), buckets=4),
                           target2, buckets=4)
    assert snap2 == snap
    # different content → different id
    target3 = str(tmp_path / "pages_tbl3")
    snap3 = write_bucketed(with_bucket(pages_df(spark, 600), buckets=4),
                           target3, buckets=4)
    assert snap3 != snap
