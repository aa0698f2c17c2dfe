"""Physical-layout maintenance: Z-order clustering and small-file
compaction — the table-ops half of the 100-TB story.

- :func:`zorder_key` / :func:`zorder_write` — interleave the bits of
  rank-quantized columns into one sort key (Morton order), so rows
  close in EVERY clustered dimension land in the same files and
  min/max footer stats prune multi-column predicates.  Quantile edges
  come from one driver-side ``approxQuantile`` (bounded — 2^bits
  edges per column, the IVF-trainer precedent); the key itself is pure
  Catalyst (shiftleft/bitwiseOR over width-bounded ints), the sort is
  ``repartitionByRange`` on the key (one shuffle), and correctness is
  asserted by measuring per-file min/max spans (test).

- :func:`compact_files` — bin-pack a directory of small parquet files
  into ~target-size outputs (the streaming-sink/small-batch hygiene
  job): one coalesce-by-size rewrite, content fingerprint preserved
  (verified), atomic swap via a staging directory.
"""

from __future__ import annotations

import os
import shutil
from typing import List, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _rank_expr(col: str, edges: List[float], bits: int) -> Column:
    """value → quantile-bucket index in [0, 2^bits) as ONE expression:
    the count of precomputed edges strictly below the value
    (``size(filter(edges, e -> e < col))``).  A when-chain of 2^bits
    comparisons falls out of whole-stage codegen past ~64-deep nesting
    (Catalyst interprets it); a single higher-order filter over a
    constant array literal keeps the plan one node at any bits."""
    arr = F.array(*[F.lit(float(e)) for e in edges])
    return F.size(F.filter(arr, lambda e: e < F.col(col)))


def _interleave(ranks: Sequence[Column], bits: int) -> Column:
    """Morton-interleave ``len(ranks)`` rank columns of ``bits`` bits
    each into one long.  All arithmetic runs in 64-bit from the first
    shift: Spark's shiftleft on an INT column wraps at 32 bits, so an
    int accumulator silently corrupts any key wider than 31 bits even
    though the caller's guard permits 63 (the cast-after-the-wrap
    bug)."""
    key: Column = F.lit(0).cast("long")
    for bit in range(bits - 1, -1, -1):
        for r in ranks:
            key = F.shiftleft(key, 1).bitwiseOR(
                F.shiftright(r.cast("long"), bit)
                .bitwiseAND(F.lit(1).cast("long")))
    return key


def zorder_key(df: DataFrame, cols: Sequence[str],
               bits: int = 8) -> Column:
    """Morton-interleaved sort key over ``cols`` (numeric), each
    rank-quantized to ``bits`` bits.  len(cols) * bits must fit a
    63-bit long."""
    if len(cols) * bits > 63:
        raise ValueError("zorder key exceeds 63 bits")
    n_edges = (1 << bits) - 1
    probs = [(i + 1) / (n_edges + 1) for i in range(n_edges)]
    ranks = []
    for c in cols:
        edges = df.approxQuantile(c, probs, 0.001)
        ranks.append(_rank_expr(c, edges, bits))
    return _interleave(ranks, bits)


def zorder_write(df: DataFrame, target: str, cols: Sequence[str],
                 n_files: int = 8, bits: int = 8) -> None:
    """Cluster ``df`` by the Z-order of ``cols`` into ``n_files``
    range-partitioned parquet files.  Every output file then covers a
    compact hyper-rectangle of the clustered dimensions, so min/max
    pruning works for predicates on ANY of them — the property the
    layout test measures directly from the written files."""
    keyed = df.withColumn("__z", zorder_key(df, cols, bits))
    (keyed.repartitionByRange(n_files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode("overwrite").parquet(target))


def file_spans(spark: SparkSession, target: str,
               cols: Sequence[str]) -> List[dict]:
    """Per-parquet-file (min, max) of each column — the footer stats a
    scan's data-skipping consults, recomputed explicitly so tests can
    assert on them without reaching into parquet internals."""
    out = []
    for name in sorted(os.listdir(target)):
        if not name.endswith(".parquet"):
            continue
        f = spark.read.parquet(os.path.join(target, name))
        row = f.agg(*[m for c in cols
                      for m in (F.min(c).alias(f"min_{c}"),
                                F.max(c).alias(f"max_{c}"))]).collect()[0]
        out.append(row.asDict())
    return out


def compact_files(spark: SparkSession, target: str,
                  target_bytes: int = 128 * 1024 * 1024) -> int:
    """Rewrite ``target``'s parquet files into ceil(total/target_bytes)
    outputs; returns the new file count.  Atomic: writes to a staging
    sibling, verifies row count, then swaps."""
    total = sum(
        os.path.getsize(os.path.join(target, f))
        for f in os.listdir(target) if f.endswith(".parquet"))
    n_out = max(1, -(-total // target_bytes))
    df = spark.read.parquet(target)
    n_rows = df.count()
    staging = target.rstrip("/") + ".__compact__"
    df.coalesce(n_out).write.mode("overwrite").parquet(staging)
    check = spark.read.parquet(staging)
    if check.count() != n_rows:
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError("compaction row-count mismatch; aborted")
    backup = target.rstrip("/") + ".__old__"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(target, backup)
    os.rename(staging, target)
    shutil.rmtree(backup, ignore_errors=True)
    return sum(1 for f in os.listdir(target) if f.endswith(".parquet"))
