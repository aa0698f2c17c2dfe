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
    # Widen to double BEFORE the multiply: float32 products lose ~7 digits,
    # which is enough to flip LSH sign bits / argmax cell choices near the
    # boundary and diverge from any double-precision oracle.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
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


def train_ivf_centroids(corpus: DataFrame, dim: int, n_cells: int = 16,
                        sample: int = 4096, iters: int = 8,
                        vec_col: str = "embedding", seed: int = 5,
                        id_col: str = "vec_id") -> List[List[float]]:
    """Driver-side IVF coarse quantizer: k-means (Lloyd) on a bounded
    sample.  Sampling is the standard IVF training regime — the collect is
    O(sample·dim), independent of corpus size."""
    import numpy as np

    # Ordered limit: the training sample must be a deterministic function of
    # the table (an unordered limit depends on partition scan order), both
    # for reproducible builds and so an oracle can re-derive the centroids.
    rows = (
        corpus.orderBy(id_col).select(vec_col).limit(sample).collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    return kmeans_unit(x, n_cells, iters, seed)


def kmeans_unit(x: "np.ndarray", n_cells: int, iters: int = 8,
                seed: int = 5) -> List[List[float]]:
    """Spherical Lloyd k-means on float64 rows (shared by the Spark trainer
    and the DuckDB oracle builder — both must produce bit-identical
    centroids from the same sample)."""
    import numpy as np

    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return [c.tolist() for c in cents]


def _cell_sims(vec: Column, centroids: List[List[float]]) -> Column:
    """Array of cosine sims to each centroid (centroids are unit-norm)."""
    n = norm(vec)
    return F.array(*[
        F.when(n > 0, dot(vec, F.array(*[F.lit(w) for w in c])) / n)
        .otherwise(F.lit(0.0))
        for c in centroids
    ])


def ivf_cell(vec: Column, centroids: List[List[float]]) -> Column:
    """Nearest-centroid cell id (0-based)."""
    sims = _cell_sims(vec, centroids)
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def ivf_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
             n_cells: int = 16, nprobe: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec",
             centroids: List[List[float]] | None = None) -> DataFrame:
    """IVF ANN: corpus partitioned into coarse cells; each query probes its
    ``nprobe`` nearest cells only.  The inverted-file scan shape: the join
    key is the cell id, so a probe touches 1/n_cells of the corpus per
    probed cell instead of everything (at 10^12 vectors the cells would be
    the physical partitioning / clustering keys)."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, dim, n_cells,
                                        vec_col=vec_col, id_col=id_col)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        ivf_cell(F.col(vec_col), centroids).alias("cell"),
    )
    qsims = _cell_sims(F.col(q_vec_col), centroids)
    ranked_cells = F.slice(
        F.reverse(F.array_sort(F.zip_with(
            qsims,
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda s, i: F.struct(s.alias("sim"), i.cast("int").alias("cell")),
        ))),
        1, nprobe,
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).alias("qv"),
        F.explode(F.transform(ranked_cells, lambda s: s.getField("cell")))
        .alias("cell"),
    )
    joined = c.join(F.broadcast(q), "cell").select(
        "q_id", "vec_id", cosine(F.col("v"), F.col("qv")).alias("cos")
    ).dropDuplicates(["q_id", "vec_id"])
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(df: DataFrame, dim: int, min_cos: float = 0.95,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            n_bits: int = 10, seed: int = 99,
                            bands: int = 1) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ τ, blocked by LSH bucket (pairs are
    only compared within a bucket — the embedding analogue of banded LSH).

    ``bands`` > 1 computes ``bands`` independent n_bits-codes (seeded
    seed+band) and takes candidates agreeing on ANY band — the OR-of-bands
    recall construction from MinHash LSH.  Size ``n_bits`` ≈ log2(corpus /
    target_bucket_size): the in-bucket self-join is quadratic in bucket
    size, so at 10^9 vectors you want ≥20 bits per band, with bands
    recovering the recall the extra bits cost.  Precision is exact either
    way (candidates are cosine-verified)."""
    coded = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("v"),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                lsh_code(F.col(vec_col), dim, n_bits, seed + b).alias("code"),
            )
            for b in range(bands)
        ])).alias("bk"),
    ).select("doc_id", "v", "bk.band", "bk.code")
    l, r = coded.alias("l"), coded.alias("r")
    return (
        l.join(r, ["band", "code"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            cosine(F.col("l.v"), F.col("r.v")).alias("cos"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cos") >= min_cos)
    )
