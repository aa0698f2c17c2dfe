"""Deterministic data-mixing quota sampler.

Training-data pipelines mix sources to a target distribution ("30% web,
30% code, 20% books…") and need the draw to be (a) exact per group,
(b) deterministic across reruns and cluster layouts, and (c) cheap at
corpus scale.  ``quota_sample_ids`` ranks each group by a seeded md5 of
the row id — a reproducible uniform order any engine can re-derive (the
DuckDB oracle re-computes the identical hex strings) — and keeps the
first ``quota`` rows per group.

100-TB shape: the rank runs over a NARROW (group, id) projection, so
the one window shuffle carries ~50 bytes/row no matter how wide the
corpus rows are; document text never crosses it.  ``quota_sample``
joins the winning ids back to the full table when the caller wants
payload rows — that id-keyed join is the documented cost (winners can
be a large fraction of the corpus, so it is a shuffle join, not a
broadcast, by default).

Changing ``seed`` re-draws an independent sample; keeping it fixed
makes the sample stable under appends only for rows that keep their
ids (a new row can displace an old one at the quota boundary — exact
quotas cannot be append-stable, by construction).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: unit separator — joins seed and id unambiguously (neither contains it)
_SEP = "\x1f"


def _rank_col(id_col: str, seed: str):
    """Seeded deterministic order: md5 hex of seed+sep+id, ties (md5
    collisions — practically never, but determinism must not depend on
    that) broken by the id itself."""
    return [
        F.md5(F.concat_ws(_SEP, F.lit(seed),
                          F.col(id_col).cast("string"))),
        F.col(id_col),
    ]


def quota_sample_ids(df: DataFrame, group_col: str, id_col: str,
                     quotas: Mapping[str, int],
                     seed: str = "mix-v1") -> DataFrame:
    """(group, id) winners: the first ``quotas[group]`` rows of each
    group in seeded-hash order.  Groups absent from ``quotas`` are
    dropped; groups smaller than their quota are kept whole.

    One shuffle (the per-group window over the narrow projection) plus
    a broadcast of the quota map.
    """
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(g, int(n)) for g, n in quotas.items()],
        f"{group_col} string, quota bigint")
    w = Window.partitionBy(group_col).orderBy(*_rank_col(id_col, seed))
    return (
        df.select(group_col, id_col)
        .join(F.broadcast(qdf), group_col)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("quota"))
        .select(group_col, id_col)
    )


_HEX = "0123456789abcdef"


def shard_shuffle(df: DataFrame, id_col: str,
                  seed: str = "shuffle-v1",
                  n_shards: int = 256) -> DataFrame:
    """Deterministic global shuffle into training shards.

    (id, shard, pos): every row gets a shard (0..n_shards-1) and a
    dense 0-based position inside it, both pure functions of
    (seed, id) — the reproducible corpus permutation every pretraining
    run needs (re-runs, resumes and different cluster layouts must
    read the same training order).  Shard = first two hex digits of
    the seeded md5 (mod n_shards, so ``n_shards`` <= 256 stays
    perfectly uniform-by-construction); order within a shard = the
    full digest.

    100-TB shape: one shuffle keyed by shard over the NARROW
    (id, digest) projection — text never moves; size ``n_shards`` to
    the cluster (each shard is sorted by exactly one task, and the
    md5 prefix makes shard sizes uniform, so there is no skew by
    construction).  Writing each shard sorted by ``pos`` materializes
    the training order without any global sort.
    """
    if not 1 <= n_shards <= 256:
        raise ValueError("n_shards must be in 1..256 (two hex digits)")
    h = F.md5(F.concat_ws(_SEP, F.lit(seed),
                          F.col(id_col).cast("string")))
    d = df.select(F.col(id_col)).withColumn("__h", h)
    shard = (
        (F.expr(f"instr('{_HEX}', substring(__h, 1, 1)) - 1") * 16
         + F.expr(f"instr('{_HEX}', substring(__h, 2, 1)) - 1"))
        % n_shards)
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        d.withColumn("shard", shard.cast("long"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select(id_col, "shard", "pos")
    )


def quota_sample(df: DataFrame, group_col: str, id_col: str,
                 quotas: Mapping[str, int],
                 seed: str = "mix-v1") -> DataFrame:
    """Full sampled rows: ``quota_sample_ids`` winners semi-joined back
    to the input.  The id-keyed semi join is the one place the payload
    columns move — a shuffle join by design (the sample is usually far
    past broadcast size at corpus scale)."""
    ids = quota_sample_ids(df, group_col, id_col, quotas, seed)
    return df.join(ids.select(id_col), id_col, "left_semi")


def split_assign(df: DataFrame, id_col: str,
                 fractions: Mapping[str, float] | None = None,
                 seed: str = "split-v1") -> DataFrame:
    """Deterministic train/val/test assignment by seeded hash fraction.

    (id, bucket, split): ``bucket`` is the first FOUR hex digits of the
    seeded md5 (0..65535, uniform by construction); splits own
    contiguous bucket ranges sized by ``fractions`` (cumulative
    thresholds rounded to integer buckets, so the realized fractions
    are exact multiples of 1/65536).  A pure function of (seed, id) —
    rows keep their split under appends, re-runs and any cluster
    layout, which is what makes held-out sets trustworthy.

    100-TB shape: zero exchanges — a projection of the scan; the split
    can be computed independently by any engine (the DuckDB oracle
    re-derives it digit-for-digit).
    """
    fractions = dict(fractions or
                     {"train": 0.9, "val": 0.05, "test": 0.05})
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    names, cuts, acc = list(fractions), [], 0.0
    for name in names[:-1]:
        acc += fractions[name]
        cuts.append(round(acc * 65536))
    h = F.md5(F.concat_ws(_SEP, F.lit(seed),
                          F.col(id_col).cast("string")))
    d = df.select(F.col(id_col)).withColumn("__h", h)
    digit = lambda i: F.expr(  # noqa: E731
        f"instr('{_HEX}', substring(__h, {i}, 1)) - 1")
    bucket = (digit(1) * 4096 + digit(2) * 256
              + digit(3) * 16 + digit(4))
    split = F.lit(names[-1])
    for name, cut in reversed(list(zip(names[:-1], cuts))):
        split = F.when(F.col("bucket") < cut, F.lit(name)) \
            .otherwise(split)
    return (
        d.withColumn("bucket", bucket.cast("long"))
        .select(F.col(id_col), F.col("bucket"), split.alias("split"))
    )


def write_training_shards(df: DataFrame, out_dir: str, id_col: str,
                          seed: str = "shuffle-v1",
                          n_shards: int = 256) -> dict:
    """Materialize the deterministic training order, resumably.

    Routes every row through :func:`shard_shuffle`, writes each shard
    as its own partition directory sorted by ``pos`` (reading a shard's
    files in order IS the training order — no global sort ever runs),
    and records a manifest ``(shard → rows)`` plus the write params.

    RESUMABLE: shards already present in the manifest are skipped on a
    re-run (the assignment is a pure function of (seed, id), so a
    restart reproduces byte-identical shard contents — skipping is
    sound).  Returns the manifest dict.  At 100 TB each shard is one
    task's sorted write; size ``n_shards`` to the cluster.
    """
    import json
    import os

    mpath = os.path.join(out_dir, "_shards_manifest.json")
    manifest = {"seed": seed, "n_shards": n_shards, "shards": {}}
    if os.path.exists(mpath):
        with open(mpath) as f:
            old = json.load(f)
        if old.get("seed") != seed or old.get("n_shards") != n_shards:
            raise ValueError("manifest exists with different params")
        manifest = old
    done = {int(k) for k in manifest["shards"]}
    routed = df.join(shard_shuffle(df, id_col, seed, n_shards),
                     id_col)
    todo = routed.filter(~F.col("shard").isin(*done)) if done else routed
    (todo.repartition(n_shards, "shard")
         .sortWithinPartitions("pos")
         .write.mode("append").partitionBy("shard")
         .parquet(os.path.join(out_dir, "data")))
    spark = df.sparkSession
    counts = {int(r["shard"]): int(r["n"]) for r in
              spark.read.parquet(os.path.join(out_dir, "data"))
              .groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    manifest["shards"] = {str(k): v for k, v in sorted(counts.items())}
    os.makedirs(out_dir, exist_ok=True)
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    return manifest
