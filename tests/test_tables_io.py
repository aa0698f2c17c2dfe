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


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Co-located join: two tables bucketed on the same key with the
    same bucket count sort-merge-join with ZERO shuffle exchanges and
    (thanks to sortBy) zero Sort nodes -- the 100-TB fact-fact join
    shape.  Row parity vs the plain shuffled join is asserted too."""
    from pyspark.sql import functions as F

    from katydid_haskell_spark.sources.tables import write_bucketed_table

    a = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 20_000, 3).select(
        F.col("id").alias("k"), (F.col("id") + 1).alias("vb"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed_table(a, "bj_a", "k", 8, str(tmp_path / "a"))
        write_bucketed_table(b, "bj_b", "k", 8, str(tmp_path / "b"))
        j = spark.table("bj_a").join(spark.table("bj_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        got = j.count()
        want = a.join(b, "k").count()
        assert got == want == 6_667
        # single-bucket pruning on a key lookup: the scan reads 1 of 8
        # bucket files (SelectedBucketsCount).  The planner's
        # autoBucketedScan heuristic skips bucketed reads for plain
        # filters (no exchange to save), so force it for the lookup.
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled",
            "false")
        try:
            one = spark.table("bj_a").filter(F.col("k") == 12_345)
            p1 = one._jdf.queryExecution().executedPlan().toString()
            assert "1 out of 8" in p1, p1
            assert one.count() == 1
        finally:
            spark.conf.unset(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bj_a")
        spark.sql("DROP TABLE IF EXISTS bj_b")


def test_multi_format_roundtrip(spark, tmp_path):
    """Source-format coverage beyond parquet: the same frame written
    and re-read as ORC, CSV (with header) and JSONL keeps row content;
    schema fidelity is exact for ORC (self-describing), and CSV/JSONL
    re-reads apply an explicit schema (the production contract — crawl
    CSV/JSONL always ships with a declared schema)."""
    from pyspark.sql import functions as F

    src = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id")).alias("w"),
        (F.col("id") * 2).alias("n"),
    )
    rows = sorted((r.doc_id, r.w, r.n) for r in src.collect())

    orc_p = str(tmp_path / "t.orc")
    src.write.format("orc").save(orc_p)
    orc = spark.read.format("orc").load(orc_p)
    # ORC re-reads are nullable-by-default; names and types are exact
    assert [(f.name, f.dataType) for f in orc.schema] \
        == [(f.name, f.dataType) for f in src.schema]
    assert sorted((r.doc_id, r.w, r.n) for r in orc.collect()) == rows

    csv_p = str(tmp_path / "t.csv")
    src.write.option("header", True).csv(csv_p)
    csv = spark.read.option("header", True).schema(src.schema).csv(csv_p)
    assert sorted((r.doc_id, r.w, r.n) for r in csv.collect()) == rows

    jl_p = str(tmp_path / "t.jsonl")
    src.write.json(jl_p)
    jl = spark.read.schema(src.schema).json(jl_p)
    assert sorted((r.doc_id, r.w, r.n) for r in jl.collect()) == rows


def test_zorder_write_narrows_file_spans(spark, tmp_path):
    """Z-order clustering: after zorder_write on (x, y), each output
    file's min/max span is narrow in BOTH dimensions, vs a naive
    insertion-order write where late files span the full y range —
    the property min/max data skipping prunes on."""
    from pyspark.sql import functions as F

    from katydid_haskell_spark.sources.layout import (
        file_spans,
        zorder_write,
    )

    n = 20_000
    # x is insertion-ordered, y is decorrelated: naive layout is
    # perfect on x and useless on y
    df = spark.range(n).select(
        F.col("id").alias("x"),
        ((F.col("id") * 7919) % n).alias("y"),
    )
    naive = str(tmp_path / "naive")
    df.repartitionByRange(8, "x").write.parquet(naive)
    zo = str(tmp_path / "zo")
    zorder_write(df, zo, ["x", "y"], n_files=8)

    def avg_span(spans, c):
        return sum(s[f"max_{c}"] - s[f"min_{c}"] for s in spans) / len(spans)

    nv = file_spans(spark, naive, ["x", "y"])
    zv = file_spans(spark, zo, ["x", "y"])
    # thresholds leave headroom over the run-to-run spread:
    # repartitionByRange's reservoir sampling shifts file boundaries
    # slightly per run (measured avg y span 11.6k-12.0k over repeated
    # runs at n=20k — one sample grazed the old 0.6n cut); the property
    # is the ~0.58n-vs-1.0n contrast, not a knife-edge constant
    assert avg_span(nv, "y") > 0.9 * n          # naive: y unpruned
    assert avg_span(zv, "y") < 0.68 * n         # z-order: y narrowed
    assert avg_span(zv, "x") < 0.68 * n         # ... without losing x
    # content preserved
    assert spark.read.parquet(zo).count() == n


def test_zorder_interleave_64bit(spark):
    """The Morton interleave must run in 64-bit arithmetic end-to-end:
    3 cols x 12 bits = a 36-bit key, which a 32-bit accumulator
    (Spark shiftleft on INT wraps) silently corrupts.  Compare the
    Catalyst interleave against the Python closed form bit-by-bit."""
    from pyspark.sql import functions as F

    from katydid_haskell_spark.sources.layout import _interleave

    bits, ncols = 12, 3
    rows = [(0, 0, 0), (4095, 4095, 4095), (2048, 1024, 512),
            (1, 2, 3), (4094, 1, 2047), (3000, 123, 4001)]
    df = spark.createDataFrame(rows, "r0 int, r1 int, r2 int")
    got = df.select(
        "r0", "r1", "r2",
        _interleave([F.col("r0"), F.col("r1"), F.col("r2")],
                    bits).alias("z")).collect()

    def morton(rs):
        key = 0
        for bit in range(bits - 1, -1, -1):
            for r in rs:
                key = (key << 1) | ((r >> bit) & 1)
        return key

    for row in got:
        assert row.z == morton([row.r0, row.r1, row.r2])
        assert row.z < (1 << (bits * ncols))
    assert max(r.z for r in got) >= (1 << 32)   # the wrap regime


def test_zorder_rank_expr_single_expression(spark):
    """_rank_expr is one size(filter(...)) node (not a 2^bits-deep
    when-chain) and counts edges strictly below the value, nulls -> 0."""
    from pyspark.sql import functions as F

    from katydid_haskell_spark.sources.layout import _rank_expr

    edges = [float(e) for e in range(1, 8)]      # bits=3 -> 7 edges
    df = spark.createDataFrame(
        [(0.5,), (1.0,), (1.5,), (7.5,), (None,)], "v double")
    out = df.select(_rank_expr("v", edges, 3).alias("r")).collect()
    assert [r.r for r in out] == [0, 0, 1, 7, 0]


def test_compact_files_roundtrip(spark, tmp_path):
    """compact_files bin-packs many small files into few, preserves
    rows exactly, and leaves no staging debris."""
    import os

    from pyspark.sql import functions as F

    from katydid_haskell_spark.sources.layout import compact_files

    target = str(tmp_path / "t")
    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 7).alias("k"))
    df.repartition(40).write.parquet(target)
    before = sum(1 for f in os.listdir(target) if f.endswith(".parquet"))
    assert before >= 30
    rows_before = sorted(r.id for r in spark.read.parquet(target).collect())
    n_after = compact_files(spark, target, target_bytes=1 << 30)
    assert n_after == 1
    assert sorted(r.id for r in
                  spark.read.parquet(target).collect()) == rows_before
    assert not os.path.exists(target + ".__compact__")
    assert not os.path.exists(target + ".__old__")
