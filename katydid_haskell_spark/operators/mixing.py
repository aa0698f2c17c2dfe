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
corpus rows are; document text never crosses it — and since r7 the
window input is first cut to a closed-form hash-prefix PREFIX of each
group (~2x the quota in expectation, see ``quota_bucket_cutoff``), so
no task ever sorts a whole group.  ``quota_sample`` joins the winning
ids back to the full table when the caller wants payload rows — that
id-keyed join is the documented cost (winners can be a large fraction
of the corpus, so it is a shuffle join, not a broadcast, by default).

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


def quota_bucket_cutoff(n_group: int, quota: int, safety: int = 2) -> int:
    """Closed-form 16-bit hash-prefix cutoff for the quota pre-filter:
    rows whose first-4-hex-digit bucket (0..65535) sits below it are
    expected to number ~``safety * quota`` of the ``n_group`` uniform
    hashes.  Pure integer arithmetic (floor-div + 1), so any engine
    derives the identical value from the same two integers; 65536 means
    keep the whole group (already at or under the target)."""
    if n_group <= 0:
        return 65536
    return min(65536, (65536 * quota * safety) // n_group + 1)


def quota_sample_ids(df: DataFrame, group_col: str, id_col: str,
                     quotas: Mapping[str, int],
                     seed: str = "mix-v1", safety: int = 2) -> DataFrame:
    """(group, id) winners: the first ``quotas[group]`` rows of each
    group in seeded-hash order.  Groups absent from ``quotas`` are
    dropped; groups smaller than their quota are kept whole.

    100-TB shape (two-phase): the per-group row_number window is exact
    but a window partition is ONE task's sort — with a handful of mix
    groups over a crawl corpus that was ~N/groups rows per task (the r6
    verdict's scale-killer).  Phase 1 counts each group (one cheap
    partial-agg job) and derives a closed-form hash-prefix cutoff
    (:func:`quota_bucket_cutoff`, ~``safety * quota`` expected
    survivors).  Phase 2 windows ONLY the survivors, whose bucket range
    [0, cutoff) sorts strictly before every cut row in the full md5
    order — the survivor set is a per-group PREFIX of the exact order,
    so the winners are unchanged and the single-task sort is O(quota),
    not O(N/groups).  Groups whose survivor prefix comes up short
    (undershoot odds shrink exponentially in the quota; possible at
    tiny quotas) are widened back to their full row set before the
    window — the result is always exactly the quota-truncated seeded
    order, which is why the DuckDB oracle can keep ranking the full
    group.
    """
    spark = df.sparkSession
    quotas = {g: int(n) for g, n in quotas.items()}
    h = F.md5(F.concat_ws(_SEP, F.lit(seed),
                          F.col(id_col).cast("string")))
    digit = lambda i: F.expr(  # noqa: E731
        f"instr('{_HEX}', substring(__h, {i}, 1)) - 1")
    qdf = spark.createDataFrame(
        [(g, n) for g, n in quotas.items()],
        f"{group_col} string, quota bigint")
    narrow = (df.select(group_col, id_col)
              .join(F.broadcast(qdf), group_col)
              .withColumn("__h", h)
              .withColumn("__b", (digit(1) * 4096 + digit(2) * 256
                                  + digit(3) * 16 + digit(4))
                          .cast("long")))
    # phase 1, ONE job (was two in r7 — the 3x wall-time regression):
    # per-group total + exact count below every power-of-two 16-bit
    # threshold, all from one partial agg.  The cutoff is rounded UP to
    # the next power of two so the survivor count can be read off the
    # same collected row — survivors stay a per-group PREFIX of the
    # hash order (superset of the closed-form cut, <= ~2x more, still
    # O(quota)), so the winners and the full-window oracle are
    # unchanged.
    thresh = [1 << i for i in range(17)]  # 1, 2, ..., 65536
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(F.col("__b") < t, 1).otherwise(0))
        .alias(f"__c{i}") for i, t in enumerate(thresh)]
    stats = {r[0]: r for r in
             narrow.groupBy(group_col).agg(*aggs).collect()}
    n_grp, cuts, n_surv = {}, {}, {}
    for g, q in quotas.items():
        r = stats.get(g)
        n_grp[g] = r["__n"] if r is not None else 0
        base = quota_bucket_cutoff(n_grp[g], q, safety)
        i = next(i for i, t in enumerate(thresh) if t >= base)
        cuts[g] = thresh[i]
        n_surv[g] = r[f"__c{i}"] if r is not None else 0
    cdf = spark.createDataFrame(
        [(g, c) for g, c in cuts.items()],
        f"{group_col} string, cut bigint")
    pre = narrow.join(F.broadcast(cdf), group_col)
    bad = [g for g, q in quotas.items()
           if n_surv.get(g, 0) < min(q, n_grp.get(g, 0))]
    keep = F.col("__b") < F.col("cut")
    if bad:  # widen-on-undershoot: exact fallback for those groups only
        keep = keep | F.col(group_col).isin(bad)
    # phase 2: the exact window, over the bounded survivor prefix
    w = Window.partitionBy(group_col).orderBy("__h", F.col(id_col))
    return (
        pre.filter(keep)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("quota"))
        .select(group_col, id_col)
    )


_HEX = "0123456789abcdef"


def shard_expr(h_col: str, n_shards: int):
    """The shard closed form shared by :func:`shard_shuffle`,
    ``chunking.pack_token_blocks`` and ``streaming.stream_route``:
    parse the leading hex digits of the seeded md5 in ``h_col`` and take
    them mod ``n_shards``.

    ``n_shards <= 256`` uses the first TWO digits — the original form,
    mirrored literally by every shard oracle, so existing assignments
    are unchanged.  Larger counts (the >256-executor cluster case) use
    the first FOUR digits and must divide 65536, which keeps shard
    sizes exactly uniform by construction (a uniform 0..16^d-1 integer
    mod a divisor of 16^d is uniform)."""
    if not 1 <= n_shards <= 65536:
        raise ValueError("n_shards must be in 1..65536")
    digit = lambda i: F.expr(  # noqa: E731
        f"instr('{_HEX}', substring({h_col}, {i}, 1)) - 1")
    if n_shards <= 256:
        return (digit(1) * 16 + digit(2)) % n_shards
    if 65536 % n_shards:
        raise ValueError(
            "n_shards > 256 must divide 65536 (four hex digits stay "
            "uniform by construction)")
    return (digit(1) * 4096 + digit(2) * 256
            + digit(3) * 16 + digit(4)) % n_shards


def shard_shuffle(df: DataFrame, id_col: str,
                  seed: str = "shuffle-v1",
                  n_shards: int = 256) -> DataFrame:
    """Deterministic global shuffle into training shards.

    (id, shard, pos): every row gets a shard (0..n_shards-1) and a
    dense 0-based position inside it, both pure functions of
    (seed, id) — the reproducible corpus permutation every pretraining
    run needs (re-runs, resumes and different cluster layouts must
    read the same training order).  Shard = leading hex digits of the
    seeded md5 mod n_shards (:func:`shard_expr`: two digits up to 256
    shards — the original form every oracle mirrors — four digits and
    a divide-65536 requirement above that, so >256-executor clusters
    keep uniform shards); order within a shard = the full digest.

    100-TB shape: one shuffle keyed by shard over the NARROW
    (id, digest) projection — text never moves; size ``n_shards`` to
    the cluster (each shard is sorted by exactly one task, and the
    md5 prefix makes shard sizes uniform, so there is no skew by
    construction).  Writing each shard sorted by ``pos`` materializes
    the training order without any global sort.
    """
    h = F.md5(F.concat_ws(_SEP, F.lit(seed),
                          F.col(id_col).cast("string")))
    d = df.select(F.col(id_col)).withColumn("__h", h)
    shard = shard_expr("__h", n_shards)
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


def temperature_targets(counts: Mapping[str, int], alpha: float = 0.5,
                        total: int = 0) -> dict[str, int]:
    """Integer per-group targets ∝ n_g^alpha (temperature-weighted
    mixing — the multilingual up/down-sampling rule from the public
    XLM-R/mBERT training recipes), capped at the group size.

    Shared-fn discipline: the float pow + normalize runs ONCE here in
    Python — the Spark operator calls it on collected counts and the
    DuckDB oracle builder calls it on the SAME counts re-derived from
    the parquet — so both sides hold the identical integer targets and
    no cross-engine float arithmetic ever happens.  ``int()`` floors,
    so sum(targets) <= total (never over-draws)."""
    w = {g: float(n) ** alpha for g, n in counts.items() if n > 0}
    s = sum(w.values())
    if s <= 0:
        return {}
    return {g: min(counts[g], int(total * wg / s)) for g, wg in w.items()}


def temperature_sample(df: DataFrame, group_col: str, id_col: str,
                       alpha: float = 0.5, total: int = 0,
                       seed: str = "temp-v1",
                       safety: int = 2) -> DataFrame:
    """Temperature-weighted corpus mixing: per-group quotas from
    :func:`temperature_targets` (α<1 flattens the group distribution —
    low-resource groups are up-weighted relative to their share), drawn
    deterministically by :func:`quota_sample_ids`.

    100-TB shape: one extra partial-agg count job over the (group)
    projection to derive the targets (bounded collect — one row per mix
    group), then the quota sampler's two-phase bounded-window draw; the
    window input is a hash-prefix PREFIX of each group, so no task ever
    sorts a whole group."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(group_col).agg(F.count(F.lit(1))).collect()
        if r[0] is not None
    }
    quotas = temperature_targets(counts, alpha, total)
    return quota_sample_ids(df, group_col, id_col, quotas, seed=seed,
                            safety=safety)
