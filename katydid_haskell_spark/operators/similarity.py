"""Similarity search over embedding columns (array<float>).

- **Brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set, one scan over the corpus, per-query top-k via window.
- **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (k sign bits → one bucket key); queries probe only their bucket (and
  optionally multiprobe neighbors), turning the scan into a bucket-join.
- **IVF-style partitioning** — sampled-k-means coarse centroids; each
  query probes its `nprobe` nearest cells only.

Vector math runs as Arrow-batched numpy (pandas UDFs): Spark evaluates
higher-order array functions *interpreted* (no codegen; measured 14-19×
slower) and giant literal expressions cost seconds of Janino compilation,
so the sanctioned fast path for this math is vectorized Arrow batches.
Catalyst formulations (dot/norm/cosine/lsh_code/_cell_sims/ivf_cell) are
kept as the cross-check reference implementations.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
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
    """Exact top-k neighbors per query, TWO-PHASE.

    Phase 1 (map-side, zero shuffle of corpus rows): every scan partition
    scores its rows against the collected query matrix in Arrow batches
    and keeps a bounded per-query partial top-k (carry <= |Q|*k rows),
    emitting at most k rows per (query, partition).  Phase 2: exact
    window rank over the k*P survivors per query.  Winners are identical
    to a global sort — top-k under a strict total order ((-cos, vec_id);
    vec_id unique) is prefix-closed, so every global winner survives its
    own partition's cut.

    The pre-r8 shape (corpus x queries crossJoin + per-query window) put
    the WHOLE corpus through one task's sort per query — at 100 TB a
    single q_id partition would sort ~|corpus| rows.  Now the only
    exchange carries k rows per query per partition.  The query-side
    collect is bounded by the ANN contract (small query sets — the same
    discipline as pq_topk / probe_cells).

    Cosine parity: per-batch math is bit-identical to the previous
    cosine_pairs_udf ((x*y).sum(axis=1), np.linalg.norm per row), so cos
    values, ranks and ties are unchanged.

    Output: q_id, vec_id, cos, rank (1-based). Ties broken by vec_id for
    determinism.
    """
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    q_rows = queries.select(q_id_col, q_vec_col).collect()
    schema = StructType([
        StructField("q_id", queries.schema[q_id_col].dataType),
        StructField("vec_id", corpus.schema[id_col].dataType),
        StructField("cos", DoubleType()),
    ])
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], schema.add(StructField("rank", IntegerType())))
    q_ids = [r[0] for r in q_rows]
    qm = np.array([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.linalg.norm(qm, axis=1)
    m = len(q_ids)

    def part_topk(batches):
        carry = None
        for pdf in batches:
            x = _stack(pdf[vec_col], qm.shape[1])
            if not len(x):
                continue
            nx = np.linalg.norm(x, axis=1)
            frames = []
            for j in range(m):
                d = (x * qm[j]).sum(axis=1)
                denom = nx * qn[j]
                cos = np.where(denom > 0,
                               d / np.where(denom > 0, denom, 1.0), 0.0)
                frames.append(pd.DataFrame(
                    {"q_id": q_ids[j], "vec_id": pdf[id_col].values,
                     "cos": cos}))
            batch_all = pd.concat(frames, ignore_index=True)
            carry = (batch_all if carry is None
                     else pd.concat([carry, batch_all], ignore_index=True))
            carry = (carry
                     .sort_values(["cos", "vec_id"],
                                  ascending=[False, True], kind="mergesort")
                     .groupby("q_id", sort=False).head(k)
                     .reset_index(drop=True))
        if carry is not None:
            yield carry

    part = corpus.select(id_col, vec_col).mapInPandas(part_topk, schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        part.withColumn("rank", F.row_number().over(w))
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


def _stack(vecs: pd.Series, dim: int) -> "np.ndarray":
    if len(vecs) == 0:
        return np.zeros((0, dim), dtype=np.float64)
    return np.array([np.asarray(v, dtype=np.float64) for v in vecs])


# Relative margin below which a BLAS-computed dot is considered "within
# summation-reordering distance" of a decision boundary: reordering error
# is bounded by ~dim·ulp ≈ 1e-13 of the norm product, so 1e-9 is a safe
# three-orders-of-magnitude guard band that almost never triggers.
_REL_MARGIN = 1e-9


def _ordered_matmul(x: "np.ndarray", p: "np.ndarray") -> "np.ndarray":
    """``x @ p`` with summation as a strict left-to-right IEEE-double fold
    over the shared dimension — bit-identical to the Catalyst
    ``aggregate(zip_with(a, b, *), 0.0, +)`` fold in :func:`dot` and the
    DuckDB oracle's ordered list fold, vectorized across (row, column).

    This is the parity anchor for every sign / argmax / ordering decision
    the Arrow paths make: BLAS matmul reorders the summation (ulp-scale
    differences), so decisions near a boundary recompute through here.
    """
    out = np.zeros((x.shape[0], p.shape[1]), dtype=np.float64)
    for k in range(x.shape[1]):
        out += x[:, k][:, None] * p[k][None, :]
    return out


def _ordered_self_dot(x: "np.ndarray") -> "np.ndarray":
    """Per-row ordered-fold self dot (for norms bit-identical to
    ``sqrt(dot(v, v))`` in the Catalyst formulation)."""
    out = np.zeros(x.shape[0], dtype=np.float64)
    for k in range(x.shape[1]):
        out += x[:, k] * x[:, k]
    return out


def lsh_codes_udf(dim: int, n_bits: int, seeds: Sequence[int]):
    """Arrow-vectorized hyperplane codes, one per seed → array<long>.

    Same math as :func:`lsh_code` (double-precision dots against the
    deterministic hyperplanes) but evaluated as one numpy matmul per batch
    instead of per-row interpreted higher-order functions — Spark runs
    array HOFs without codegen, measured 14-19× slower (docs/PLANS.md).

    Float-discipline guarantee: BLAS matmul reorders the summation, so a
    dot within reordering distance of 0.0 could flip its sign bit vs the
    Catalyst/DuckDB ordered fold.  Rows with any |dot| inside the
    ``_REL_MARGIN`` guard band recompute through :func:`_ordered_matmul`
    (the exact ordered fold), so every SIGN decision this UDF makes is
    identical to the Catalyst ``dot()`` formulation — bucket membership is
    summation-order-independent.
    """
    planes = [
        np.array([_hyperplane(dim, b, s) for b in range(n_bits)]).T  # dim×bits
        for s in seeds
    ]
    plane_norms = [np.linalg.norm(p, axis=0) for p in planes]
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @pandas_udf("array<long>")
    def codes(vecs: pd.Series) -> pd.Series:
        x = _stack(vecs, dim)
        if not len(x):
            return pd.Series([], dtype="object")
        xn = np.linalg.norm(x, axis=1)
        out = []
        for p, pn in zip(planes, plane_norms):
            d = x @ p
            # sign decisions inside the reordering guard band re-decide
            # via the exact ordered fold (parity with the oracle's fold)
            risky = np.abs(d) <= _REL_MARGIN * (xn[:, None] * pn[None, :])
            rows = np.nonzero(risky.any(axis=1))[0]
            if len(rows):
                d[rows] = _ordered_matmul(x[rows], p)
            out.append(((d >= 0) @ weights))
        return pd.Series(np.stack(out, axis=1).tolist())

    return codes


def cell_assign_udf(centroids: List[List[float]], dim: int):
    """Arrow-vectorized nearest-centroid assignment (first-max ties, same
    as :func:`ivf_cell`).

    Argmax parity guarantee: rows whose top-2 sim gap is inside the
    reordering guard band recompute their dots via the exact ordered fold
    (:func:`_ordered_matmul`), so the winning cell is summation-order-
    independent.  The per-row norm divisor is a shared positive scalar and
    cannot change the argmax, so only the dots need the ordered fold.
    """
    c = np.array(centroids, dtype=np.float64)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        x = _stack(vecs, dim)
        if not len(x):
            return pd.Series([], dtype="int32")
        nrm = np.linalg.norm(x, axis=1, keepdims=True)
        d = x @ c.T
        if d.shape[1] > 1:
            top2 = np.partition(d, d.shape[1] - 2, axis=1)[:, -2:]
            risky = (top2[:, 1] - top2[:, 0]) <= _REL_MARGIN * np.maximum(
                np.abs(top2[:, 1]), 1.0)
            rows = np.nonzero(risky)[0]
            if len(rows):
                d[rows] = _ordered_matmul(x[rows], c.T)
        sims = np.where(nrm > 0, d / np.where(nrm > 0, nrm, 1.0), 0.0)
        return pd.Series(sims.argmax(axis=1).astype("int32"))

    return assign


def cosine_pairs_udf(dim: int):
    """Arrow-vectorized cosine over pairs of vector columns — the candidate
    verification path.  Same semantics as :func:`cosine` (0.0 on zero
    norms) but one numpy batch op instead of per-row interpreted HOFs."""

    @pandas_udf("double")
    def cospair(a: pd.Series, b: pd.Series) -> pd.Series:
        x, y = _stack(a, dim), _stack(b, dim)
        if not len(x):
            return pd.Series([], dtype="float64")
        denom = np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)
        d = (x * y).sum(axis=1)
        return pd.Series(np.where(denom > 0, d / np.where(denom > 0, denom, 1.0), 0.0))

    return cospair


def probe_cells_udf(centroids: List[List[float]], dim: int, nprobe: int):
    """Arrow-vectorized top-nprobe probe cells per query, ordered by
    (sim DESC, cell DESC) — the exact order of
    ``reverse(array_sort(zip_with(sims, cells, struct)))`` in the Catalyst
    formulation (which is kept for cross-checks but not used in the hot
    path: a 16×64-literal Catalyst expression costs seconds of Janino
    compilation per fresh plan).

    Ordering parity guarantee: this UDF runs on the (small) QUERY side, so
    it computes every dot and norm with the exact ordered fold
    (:func:`_ordered_matmul` / :func:`_ordered_self_dot`) — the sims are
    bit-identical to the Catalyst ``_cell_sims`` doubles, so the probe
    ORDER (incl. near-ties) is summation-order-independent."""
    c = np.array(centroids, dtype=np.float64)
    n_cells = len(centroids)
    take = min(nprobe, n_cells)

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        x = _stack(vecs, dim)
        if not len(x):
            return pd.Series([], dtype="object")
        nrm = np.sqrt(_ordered_self_dot(x))[:, None]
        sims = np.where(nrm > 0,
                        _ordered_matmul(x, c.T) / np.where(nrm > 0, nrm, 1.0),
                        0.0)
        # stable argsort over reversed columns → ties break to the HIGHER
        # cell id, matching the struct-sort-descending semantics
        rev = sims[:, ::-1]
        idx = np.argsort(-rev, axis=1, kind="stable")[:, :take]
        cells = (n_cells - 1) - idx
        return pd.Series(cells.astype("int32").tolist())

    return probes


def lsh_probe_codes_udf(dim: int, n_bits: int, seed: int, nprobe: int):
    """Arrow-vectorized QUERY-DIRECTED multiprobe codes per query vector.

    The base bucket plus ``nprobe-1`` single-bit flips chosen by smallest
    |hyperplane dot| — the bits the query is least confident about are the
    ones most likely to separate it from its true neighbors (multiprobe
    LSH, Lv et al., VLDB'07).  Ties broken by bit index (stable argsort),
    mirroring the oracle's ``list_sort`` over (|dot|, bit) structs.

    Parity guarantee: runs on the (small) QUERY side, so the dots use the
    exact ordered fold (:func:`_ordered_matmul`) — both the SIGN bits and
    the flip-bit ORDER (argsort over |dot|, where near-ties between two
    bits would otherwise be BLAS-order-dependent) are bit-identical to the
    oracle's ordered-fold dots.
    """
    planes = np.array([_hyperplane(dim, b, seed)
                       for b in range(n_bits)]).T  # dim×bits
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    take = min(max(nprobe - 1, 0), n_bits)

    @pandas_udf("array<long>")
    def probes(vecs: pd.Series) -> pd.Series:
        x = _stack(vecs, dim)
        if not len(x):
            return pd.Series([], dtype="object")
        d = _ordered_matmul(x, planes)
        base = ((d >= 0) @ weights).astype(np.int64)
        if take == 0:
            return pd.Series(base[:, None].tolist())
        order = np.argsort(np.abs(d), axis=1, kind="stable")[:, :take]
        flips = base[:, None] ^ weights[order]
        return pd.Series(
            np.concatenate([base[:, None], flips], axis=1).tolist())

    return probes


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
             n_bits: int = 10, nprobe: int = 1, n_tables: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec",
             seed: int = 1234) -> DataFrame:
    """Approximate top-k: join on hyperplane bucket code, rank in-bucket.

    Two recall knobs, composable:

    - ``nprobe`` > 1 additionally probes the buckets reached by flipping
      the query's least-confident sign bits (query-directed multiprobe —
      see :func:`lsh_probe_codes_udf`);
    - ``n_tables`` > 1 is OR-amplification: independent hyperplane sets
      (seeds ``seed..seed+L-1``), candidates unioned across tables.  The
      corpus side computes all L codes in ONE Arrow pass and explodes to
      (table, code); the join key is (table, code) so tables never
      cross-match.

    Candidate fan-out ≈ ``n_tables * nprobe / 2^n_bits`` of the corpus
    per query; recall floors at the entry-query configuration are pinned
    by ``tests/test_pipeline_ops.py::test_ann_recall_gates``.
    """
    seeds = [seed + t for t in range(n_tables)]
    codes = lsh_codes_udf(dim, n_bits, seeds)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        F.posexplode(codes(F.col(vec_col))).alias("t", "code"),
    )
    q_parts = [
        queries.select(
            F.col(q_id_col).alias("q_id"),
            F.col(q_vec_col).alias("qv"),
            F.lit(t).alias("t"),
            F.explode(
                lsh_probe_codes_udf(dim, n_bits, s, nprobe)(F.col(q_vec_col))
            ).alias("code"),
        )
        for t, s in enumerate(seeds)
    ]
    q = q_parts[0]
    for part in q_parts[1:]:
        q = q.unionByName(part)
    joined = c.join(F.broadcast(q), ["t", "code"]).select(
        "q_id", "vec_id",
        cosine_pairs_udf(dim)(F.col("v"), F.col("qv")).alias("cos"),
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


def auto_nprobe(n_cells: int, fraction: float = 0.4) -> int:
    """Probe-count sizing shared with the oracle: a FIXED nprobe over
    auto-growing cells silently loses recall as the corpus scales (probed
    fraction → 0); probing a constant fraction of cells keeps recall
    roughly stable while still scanning only ``fraction`` of the corpus.
    The 0.4 default reproduces the gate-measured sf0.01 config
    (round(22 × 0.4) = 9 probes, recall@10 = 0.775 ≥ 0.70)."""
    return max(1, round(n_cells * fraction))


def auto_n_cells(n: int, floor: int = 4, cap: int = 1024) -> int:
    """IVF cell-count sizing shared with the oracle: the standard
    ``n_cells ≈ sqrt(n)`` heuristic balances probe cost (queries scan
    nprobe/n_cells of the corpus) against quantizer cost — a PINNED cell
    count has the same fixed-bucket scaling flaw auto_n_bits fixes for
    the near-dup path.  Capped so driver k-means on the bounded training
    sample stays meaningful (cells ≪ sample)."""
    import math

    return max(floor, min(cap, round(math.sqrt(max(n, 1)))))


def ivf_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
             n_cells: int | None = 16, nprobe: int | None = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec",
             centroids: List[List[float]] | None = None) -> DataFrame:
    """IVF ANN: corpus partitioned into coarse cells; each query probes its
    ``nprobe`` nearest cells only.  The inverted-file scan shape: the join
    key is the cell id, so a probe touches 1/n_cells of the corpus per
    probed cell instead of everything (at 10^12 vectors the cells would be
    the physical partitioning / clustering keys).

    ``n_cells=None`` auto-sizes via :func:`auto_n_cells` (≈ sqrt(n), one
    count pass); ``nprobe=None`` auto-sizes via :func:`auto_nprobe` (a
    constant FRACTION of cells — a pinned probe count over growing cells
    would silently shed recall as the corpus scales)."""
    if n_cells is None:
        n_cells = auto_n_cells(corpus.count())
    if nprobe is None:
        nprobe = auto_nprobe(n_cells)
    if centroids is None:
        centroids = train_ivf_centroids(corpus, dim, n_cells,
                                        vec_col=vec_col, id_col=id_col)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        # Arrow batch matmul, not interpreted HOFs: the corpus-side cell
        # assignment is the dominant cost of this operator
        cell_assign_udf(centroids, dim)(F.col(vec_col)).alias("cell"),
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).alias("qv"),
        F.explode(
            probe_cells_udf(centroids, dim, nprobe)(F.col(q_vec_col))
        ).alias("cell"),
    )
    joined = c.join(F.broadcast(q), "cell").select(
        "q_id", "vec_id",
        cosine_pairs_udf(dim)(F.col("v"), F.col("qv")).alias("cos"),
    ).dropDuplicates(["q_id", "vec_id"])
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def auto_n_bits(n: int, target_bucket_size: int = 8,
                floor: int = 4) -> int:
    """Bucket-count sizing shared by the operator and the DuckDB oracle:
    enough bits that the EXPECTED bucket occupancy is ~target_bucket_size,
    keeping the in-bucket self-join cost per vector CONSTANT as the
    corpus grows (fixed bits make candidate pairs quadratic in n —
    measured 18× time for 10× vectors at pinned n_bits=8)."""
    import math

    if n <= target_bucket_size:
        return floor
    return max(floor, math.ceil(math.log2(n / target_bucket_size)))


def embedding_neardup_pairs(df: DataFrame, dim: int, min_cos: float = 0.95,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            n_bits: int | None = None, seed: int = 99,
                            bands: int = 1,
                            target_bucket_size: int = 8) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ τ, blocked by LSH bucket (pairs are
    only compared within a bucket — the embedding analogue of banded LSH).

    ``bands`` > 1 computes ``bands`` independent n_bits-codes (seeded
    seed+band) and takes candidates agreeing on ANY band — the OR-of-bands
    recall construction from MinHash LSH.  ``n_bits=None`` (default)
    AUTO-SIZES the bucket count from the corpus: one count pass, then
    ``auto_n_bits(n, target_bucket_size)`` ≈ log2(n / target) bits, so
    in-bucket join cost per vector stays constant as n grows (pinned
    bits are quadratic: 18× time for 10× vectors measured at n_bits=8).
    Note the recall trade: more bits per band lowers per-band recall for
    a fixed ``bands``; recall-stable scaling raises ``bands`` alongside.
    Precision is exact either way (candidates are cosine-verified)."""
    if n_bits is None:
        n_bits = auto_n_bits(df.count(), target_bucket_size)
    coded = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("v"),
        F.posexplode(
            lsh_codes_udf(dim, n_bits, [seed + b for b in range(bands)])(
                F.col(vec_col))
        ).alias("band", "code"),
    )
    l, r = coded.alias("l"), coded.alias("r")
    return (
        l.join(r, ["band", "code"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            cosine_pairs_udf(dim)(F.col("l.v"), F.col("r.v")).alias("cos"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cos") >= min_cos)
    )


def auto_dedup_cells(n: int, target_cell_size: int = 32,
                     floor: int = 4, cap: int = 512) -> int:
    """SemDeDup cluster-count sizing shared by the operator and the DuckDB
    oracle: cells ∝ n / target_cell_size keeps the EXPECTED cluster
    occupancy — and therefore the within-cluster pairwise-cosine cost per
    vector — CONSTANT as the corpus grows (the auto_n_bits discipline;
    the √n sizing IVF uses would make clusters √n-sized and the pairwise
    stage superlinear).  Capped so driver k-means on the bounded training
    sample stays meaningful (cells ≪ sample)."""
    return max(floor, min(cap, n // target_cell_size))


def semantic_dedup(df: DataFrame, dim: int, min_cos: float = 0.4,
                   n_cells: int | None = None, target_cell_size: int = 32,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   centroids: List[List[float]] | None = None,
                   sample: int = 4096, iters: int = 8,
                   seed: int = 5) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster the embedding space with a coarse k-means quantizer, compare
    pairs ONLY within a cluster, and keep one representative per
    near-duplicate relation — here deterministically the LOWEST id: a doc
    is dropped iff some lower-id doc in its cluster has cosine ≥ τ to it.

    Returns (vec_id, cell, kept) for EVERY input row — a dedup decision
    table, not pairs (the within-cluster complement of
    :func:`embedding_neardup_pairs`' LSH blocking).

    100-TB shape: centroids train on a bounded ordered sample (driver
    k-means, the IVF regime); assignment is one Arrow matmul projection
    (argmax parity-guarded, :func:`cell_assign_udf`); the self-join keys
    on the cell id with ``auto_dedup_cells`` keeping expected cluster
    size CONSTANT, so candidate pairs grow linearly in n; the verdict
    join back is id+bool rows — embeddings never cross that exchange.
    """
    if n_cells is None:
        n_cells = auto_dedup_cells(df.count(), target_cell_size)
    if centroids is None:
        centroids = train_ivf_centroids(df, dim, n_cells, sample=sample,
                                        iters=iters, vec_col=vec_col,
                                        seed=seed, id_col=id_col)
    # persist() is load-bearing (the _doc_bigram_counts discipline):
    # the assigned table has THREE consumers (both self-join sides and
    # the verdict base) with distinct exprIds, so without it the Arrow
    # assignment matmul — the dominant per-row cost — runs 3x.
    c = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        cell_assign_udf(centroids, dim)(F.col(vec_col)).alias("cell"),
    ).persist()
    l, r = c.alias("l"), c.alias("r")
    dropped = (
        l.join(r, "cell")
        .where(F.col("l.vec_id") < F.col("r.vec_id"))
        .select(
            F.col("r.vec_id").alias("vec_id"),
            cosine_pairs_udf(dim)(F.col("l.v"), F.col("r.v")).alias("cos"),
        )
        .filter(F.col("cos") >= min_cos)
        .select("vec_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return (
        c.select("vec_id", "cell")
        .join(dropped, "vec_id", "left")
        .select("vec_id", "cell",
                F.coalesce(~F.col("hit"), F.lit(True)).alias("kept"))
    )


def semantic_decontam(df: DataFrame, dim: int, eval_pred,
                      min_cos: float = 0.3,
                      n_cells: int | None = None,
                      target_cell_size: int = 32,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      centroids: List[List[float]] | None = None,
                      sample: int = 4096, iters: int = 8,
                      seed: int = 5) -> DataFrame:
    """Semantic decontamination: flag training vectors whose embedding is
    near (cosine ≥ τ) ANY held-out/eval vector — the embedding-space
    analogue of the n-gram `decontam` operator (test-set leakage removal,
    the public LLM-eval-hygiene practice).  ``eval_pred`` is a boolean
    Column over ``id_col`` naming the eval slice.

    Blocking is the SemDeDup cell quantizer (:func:`semantic_dedup`'s
    shared trainer + ``auto_dedup_cells``): eval and training vectors
    are compared only within a cell, so the pair count stays linear in
    n.  Returns (vec_id, cell, contaminated) for every NON-eval row.

    100-TB shape: one Arrow assignment projection (persisted — eval
    filter, corpus filter and verdict base share it); the eval side of
    the cell join is a tiny slice (eval sets are fixed-size while the
    corpus grows), so AQE broadcasts it; the verdict join-back carries
    id+bool rows only."""
    if n_cells is None:
        n_cells = auto_dedup_cells(df.count(), target_cell_size)
    if centroids is None:
        centroids = train_ivf_centroids(df, dim, n_cells, sample=sample,
                                        iters=iters, vec_col=vec_col,
                                        seed=seed, id_col=id_col)
    pred = (eval_pred(F.col(id_col)) if callable(eval_pred)
            else eval_pred)
    c = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        pred.alias("is_eval"),
        cell_assign_udf(centroids, dim)(F.col(vec_col)).alias("cell"),
    ).persist()
    ev = c.filter("is_eval").select(
        "cell", F.col("v").alias("ev_v"))
    corpus = c.filter(~F.col("is_eval"))
    hits = (
        corpus.join(ev, "cell")
        .select(
            "vec_id",
            cosine_pairs_udf(dim)(F.col("v"), F.col("ev_v")).alias("cos"),
        )
        .filter(F.col("cos") >= min_cos)
        .select("vec_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return (
        corpus.select("vec_id", "cell")
        .join(hits, "vec_id", "left")
        .select("vec_id", "cell",
                F.coalesce(F.col("hit"), F.lit(False))
                .alias("contaminated"))
    )


def neg_pool_cutoff(n_corpus: int, k_neg: int,
                    pool_factor: int = 100) -> str:
    """md5 hash-threshold literal for the contrastive negative pool.

    Returns a 32-char lowercase-hex string; corpus rows whose
    ``md5(seed, 'pool', cand_id)`` digest sorts BELOW it survive, sized
    so ~``pool_factor * k_neg`` rows survive in expectation.  md5 hex is
    fixed-width lowercase on every engine, so lexicographic string
    comparison IS numeric comparison — the literal is mirrorable into
    DuckDB SQL verbatim (the ``auto_n_cells`` shared-derivation
    discipline).  ``'g'`` sorts above every hex digest and means
    keep-all (corpus already at or below the pool target).
    """
    target = pool_factor * k_neg
    if n_corpus <= target:
        return "g"
    return format(int(target / n_corpus * (1 << 128)), "032x")


def contrastive_pairs(corpus: DataFrame, queries: DataFrame,
                      k_pos: int = 3, k_neg: int = 3,
                      seed: str = "neg-v1",
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      q_id_col: str = "q_id",
                      q_vec_col: str = "q_vec",
                      n_corpus: int | None = None,
                      pool_factor: int = 100) -> DataFrame:
    """Training-pair generation for retrieval/contrastive objectives:
    per query, the ``k_pos`` nearest exact-cosine neighbors (self
    excluded) as positives plus ``k_neg`` seeded-md5 random negatives
    drawn from a hash-threshold-sampled corpus pool.

    Output (q_id, cand_id, label, rank) carries NO floats — similarity
    decides membership and order only (the :func:`brute_force_topk`
    tie/ordering discipline), so the result is exactly re-derivable by
    any engine.  The negative draw is a pure function of
    (seed, q_id, cand_id): reruns, resumes and engines agree.

    100-TB shape: positives ride the broadcast-query scoring pass.
    Negatives are a TWO-stage draw: (1) one map-side corpus filter keeps
    rows with ``md5(seed,'pool',cand) < cutoff`` — :func:`neg_pool_cutoff`
    sizes the cutoff to ~``pool_factor * k_neg`` expected survivors from
    the corpus count, so the pool is O(k_neg) regardless of corpus size —
    then (2) queries cross the BROADCAST pool (|Q| x pool rows, never
    |Q| x |corpus|) and a per-query window over ``md5(seed, q, cand)``
    picks ``k_neg``, so every query draws a different ordering from the
    shared pool and the window input is bounded by the pool.  The old
    shape (queries x corpus cartesian + per-query full-corpus window)
    put ~|corpus| rows through one task's sort per query — the r6
    verdict's scale-killer.  ``n_corpus=None`` counts the corpus; pass
    the known count to skip the extra job.
    """
    from katydid_haskell_spark.operators.mixing import _SEP

    top = brute_force_topk(corpus, queries, k_pos + 1,
                           id_col, vec_col, q_id_col, q_vec_col)
    wq = Window.partitionBy("q_id").orderBy("rank")
    pos = (top.filter(F.col("vec_id") != F.col("q_id"))
           .withColumn("prank", F.row_number().over(wq))
           .filter(F.col("prank") <= k_pos)
           .select("q_id", F.col("vec_id").alias("cand_id"),
                   F.col("prank").alias("rank")))
    if n_corpus is None:
        n_corpus = corpus.count()
    cutoff = neg_pool_cutoff(n_corpus, k_neg, pool_factor)
    pool_h = F.md5(F.concat_ws(_SEP, F.lit(seed), F.lit("pool"),
                               F.col("cand_id").cast("string")))
    pool = (corpus.select(F.col(id_col).alias("cand_id"))
            .filter(pool_h < F.lit(cutoff)))
    cand = (queries.select(F.col(q_id_col).alias("q_id"))
            .crossJoin(F.broadcast(pool))
            .filter(F.col("cand_id") != F.col("q_id"))
            .join(pos.select("q_id", "cand_id"), ["q_id", "cand_id"],
                  "left_anti"))
    h = F.md5(F.concat_ws(_SEP, F.lit(seed),
                          F.col("q_id").cast("string"),
                          F.col("cand_id").cast("string")))
    wn = Window.partitionBy("q_id").orderBy(h, F.col("cand_id"))
    neg = (cand.withColumn("rank", F.row_number().over(wn))
           .filter(F.col("rank") <= k_neg)
           .select("q_id", "cand_id", "rank"))
    lab = lambda df, v: df.select(  # noqa: E731
        "q_id", "cand_id", F.lit(v).alias("label"),
        F.col("rank").cast("long").alias("rank"))
    return lab(pos, "pos").unionByName(lab(neg, "neg"))


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        scale: int = 127) -> DataFrame:
    """int8 storage quantization for embedding tables: code_i =
    clamp(round(v_i * scale), -127, 127), pure Catalyst (no Python),
    4x smaller at rest than float32 with recall loss bounded by the
    quantization step (the ANN operators above consume the dequantized
    codes / scale transparently).

    Cross-engine exactness: the parquet float32 values widen to double
    exactly, v * scale is one IEEE multiply, and Spark's HALF_UP and
    DuckDB's round() both round half away from zero — so codes are
    bit-identical across engines unless a product lands exactly on a
    .5 boundary (verified zero occurrences across the shipped SFs;
    construct-time data keeps that property)."""
    codes = F.transform(
        F.col(vec_col),
        lambda v: F.greatest(
            F.lit(-scale),
            F.least(F.lit(scale),
                    F.round(v.cast("double") * scale, 0).cast("int"))))
    return df.select(F.col(id_col), codes.alias("codes"))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bound ANN scale path
# ---------------------------------------------------------------------------
#
# IVF prunes WHICH vectors a query scores; PQ shrinks WHAT each scored
# vector costs: m sub-codebooks of ksub centroids turn a float32[dim]
# into m uint8 codes (64x smaller at dim=64/m=8), and asymmetric
# distance (ADC) scores candidates from an m x ksub lookup table without
# touching the original floats.  Training is driver-side over a bounded
# ordered sample (the IVF-trainer precedent); encoding follows the
# _ordered_matmul parity discipline so the DuckDB oracle reproduces
# every code bit-exactly (scores are c.c-literal - 2 * ordered-dot, and
# both engines fold the dot left-to-right).


def kmeans_plain(x: "np.ndarray", k: int, iters: int = 8,
                 seed: int = 7) -> "np.ndarray":
    """Plain-L2 Lloyd k-means on float64 rows, deterministic: seeded
    init, first-index argmin ties, empty clusters keep their centroid.
    Shared by the Spark-side trainer and the oracle builder — both must
    produce bit-identical centroids from the same sample."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def train_pq(x: "np.ndarray", m: int = 8, ksub: int = 16,
             iters: int = 8, seed: int = 7) -> List[List[List[float]]]:
    """(n, dim) float64 sample → m sub-codebooks of ksub centroids
    (dim % m == 0; subspace j trains with seed + j)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    if x.shape[1] % m:
        raise ValueError("dim must divide into m subspaces")
    d = x.shape[1] // m
    return [
        kmeans_plain(x[:, j * d:(j + 1) * d], ksub, iters, seed + j).tolist()
        for j in range(m)
    ]


def _ordered_sq(v) -> float:
    """Strict left-to-right sum of squares (the literal the oracle
    inlines; no SQL-side recomputation, hence no fold-order hazard)."""
    acc = 0.0
    for w in v:
        acc += float(w) * float(w)
    return acc


def pq_encode_batch(x: "np.ndarray",
                    books: List[List[List[float]]]) -> "np.ndarray":
    """(n, dim) → (n, m) int codes.  Per subspace: score_c =
    (c.c literal) - 2 * ordered_dot(sub, c); argmin, first index on
    exact ties — bit-identical to the oracle's ORDER BY score, code."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    m = len(books)
    d = x.shape[1] // m
    out = np.empty((x.shape[0], m), dtype=np.int64)
    for j, book in enumerate(books):
        cents = np.asarray(book, dtype=np.float64)
        sub = x[:, j * d:(j + 1) * d]
        sq = np.array([_ordered_sq(c) for c in book])
        scores = sq[None, :] - 2.0 * _ordered_matmul(sub, cents.T)
        out[:, j] = scores.argmin(axis=1)
    return out


def pq_codes_df(df: DataFrame, books: List[List[List[float]]],
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """corpus → (vec_id, codes: array<int>) through the Arrow-batched
    parity-disciplined encoder; the codebooks ride the closure
    (m x ksub x d floats — bounded, never corpus-scale)."""
    import numpy as np
    from pyspark.sql import types as T

    dim = len(books) * len(books[0][0])
    out_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ])

    def run(batches):
        for b in batches:
            x = _stack(b[vec_col], dim)
            codes = pq_encode_batch(x, books)
            yield pd.DataFrame({
                "vec_id": b[id_col].astype("int64"),
                "codes": [c.astype("int32").tolist() for c in codes],
            })

    return df.select(id_col, vec_col).mapInPandas(run, out_schema)


def pq_topk(corpus: DataFrame, queries: DataFrame, dim: int,
            books: List[List[List[float]]], k: int = 10,
            vec_col: str = "embedding",
            id_col: str = "vec_id") -> DataFrame:
    """ADC search: corpus stored ONLY as PQ codes; each query builds an
    m x ksub inner-product lookup table and candidates score as
    sum_j table[j][code_j] ≈ q . v — the memory shape that lets one
    executor hold 64x more corpus.  Approximate by construction; gate
    with a recall test against brute force, never an exact oracle."""
    import numpy as np
    from pyspark.sql import types as T

    m = len(books)
    codes = pq_codes_df(corpus, books, vec_col, id_col)
    qrows = queries.select(id_col, vec_col).collect()
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qids = [int(r[0]) for r in qrows]
    d = dim // m
    # lookup[q][j][c] = q_sub . cent_c
    luts = []
    for qi in range(len(qids)):
        lut = np.empty((m, len(books[0])))
        for j, book in enumerate(books):
            cents = np.asarray(book, dtype=np.float64)
            lut[j] = cents @ qmat[qi, j * d:(j + 1) * d]
        luts.append(lut)
    luts_b = np.stack(luts) if luts else np.zeros((0, m, 1))

    out_schema = T.StructType([
        T.StructField("q_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ])

    def run(batches):
        # two-phase partial top-k (the brute_force_topk part_topk
        # shape): each partition emits at most k rows per query, so the
        # final window ranks k*P survivors — never the whole corpus.
        # Winners are identical to the full sort: top-k under the
        # strict (-score, vec_id) total order is prefix-closed, so
        # every global winner survives its own partition's cut.
        carry = None
        sel = np.arange(m)[None, :]
        for b in batches:
            ids = b["vec_id"].to_numpy()
            if not len(ids):
                continue
            cd = np.stack(b["codes"].to_numpy())          # (n, m)
            frames = []
            for qi, qid in enumerate(qids):
                s = luts_b[qi][sel, cd].sum(axis=1)
                frames.append(pd.DataFrame(
                    {"q_id": qid, "vec_id": ids, "score": s}))
            batch_all = pd.concat(frames, ignore_index=True)
            carry = (batch_all if carry is None
                     else pd.concat([carry, batch_all], ignore_index=True))
            carry = (carry
                     .sort_values(["score", "vec_id"],
                                  ascending=[False, True], kind="mergesort")
                     .groupby("q_id", sort=False).head(k)
                     .reset_index(drop=True))
        if carry is not None:
            yield carry

    from pyspark.sql.window import Window

    scored = codes.mapInPandas(run, out_schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "vec_id", "rank"))
