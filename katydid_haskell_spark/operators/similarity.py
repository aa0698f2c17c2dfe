"""Similarity search over embedding columns (array<float>).

- **Brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set, one scan over the corpus computing dot products with
  ``F.zip_with`` + ``F.aggregate`` (JVM-side), per-query top-k via window.
- **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (k sign bits → one bucket key); queries probe only their bucket (and
  optionally multiprobe neighbors), turning the scan into a bucket-join.
- **IVF-style partitioning** — deterministic coarse centroids via the
  hyperplane code make the same bucket key act as an inverted-file cell;
  `nprobe` multiprobe flips the lowest-margin bits.

All vector math is built-in higher-order array functions — no UDFs.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact top-k neighbors per query: broadcast-join + window rank.

    Output: q_id, vec_id, cos, rank (1-based). Ties broken by vec_id for
    determinism.
    """
    joined = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(q_id_col).alias("q_id"),
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, bit: int, seed: int = 1234) -> List[float]:
    """Deterministic pseudo-gaussian hyperplane (sum of 4 uniforms - 2)."""
    out = []
    x = (seed * 1_000_003 + bit) & 0xFFFFFFFFFFFFFFFF
    for _ in range(dim):
        acc = 0.0
        for _ in range(4):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            acc += (x >> 11) / float(1 << 53)
        out.append(acc - 2.0)
    return out


def lsh_code(vec: Column, dim: int, n_bits: int = 12, seed: int = 1234) -> Column:
    """Random-hyperplane signature: n_bits sign bits packed into a long."""
    code = F.lit(0).cast("long")
    for b in range(n_bits):
        plane = F.array(*[F.lit(w) for w in _hyperplane(dim, b, seed)])
        bit = F.when(dot(vec, plane) >= 0,
                     F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        code = code.bitwiseOR(bit)
    return code


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
             n_bits: int = 10, nprobe: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec",
             seed: int = 1234) -> DataFrame:
    """Approximate top-k: join on hyperplane bucket code, rank in-bucket.

    ``nprobe`` > 1 additionally probes buckets at Hamming distance 1 from
    the query code (multiprobe), trading recall for fan-out.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        lsh_code(F.col(vec_col), dim, n_bits, seed).alias("code"),
    )
    qcode = lsh_code(F.col(q_vec_col), dim, n_bits, seed)
    probes = [qcode]
    if nprobe > 1:
        for b in range(min(nprobe - 1, n_bits)):
            probes.append(qcode.bitwiseXOR(F.lit(1 << b).cast("long")))
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).alias("qv"),
        F.explode(F.array(*probes)).alias("code"),
    )
    joined = c.join(F.broadcast(q), "code").select(
        "q_id", "vec_id", cosine(F.col("v"), F.col("qv")).alias("cos")
    ).dropDuplicates(["q_id", "vec_id"])
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(df: DataFrame, dim: int, min_cos: float = 0.95,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            n_bits: int = 10, seed: int = 99) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ τ, blocked by LSH bucket (pairs are
    only compared within a bucket — the embedding analogue of banded LSH)."""
    coded = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("v"),
        lsh_code(F.col(vec_col), dim, n_bits, seed).alias("code"),
    )
    l, r = coded.alias("l"), coded.alias("r")
    return (
        l.join(r, "code")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            cosine(F.col("l.v"), F.col("r.v")).alias("cos"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cos") >= min_cos)
    )
