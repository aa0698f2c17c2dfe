"""Deduplication operators for training-data pipelines.

Five families, each designed around Spark's shuffle model:

- **exact**: hash-groupBy on a normalized-content fingerprint (one shuffle
  of (hash, id) pairs — the map side emits 64-bit keys, not documents).
- **MinHash + LSH**: shingle → n minhashes → b bands; candidate pairs come
  from a self-join *within band buckets* (shuffle keyed by (band, bucket
  hash), so only colliding docs meet); verified with exact Jaccard.
- **SimHash**: 64-bit signature, split into 4×16-bit bands; near-dups =
  pairs agreeing on ≥1 band with Hamming distance ≤ k (bit ops, JVM-side).
- **n-gram Jaccard**: exact verification on candidate pairs only.
- **embedding cosine**: see :mod:`.similarity` (near-dup = cosine ≥ τ).

MinHash signatures use the classic ``(a*x + b) mod p`` permutations over
xxhash64 shingle hashes — all computed with built-in higher-order array
functions (``transform``/``aggregate``), no Python in the row path.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import fingerprint, rolling_fingerprints, shingles, words

_MERSENNE = (1 << 61) - 1


def _perm_params(num_hashes: int, seed: int = 7):
    """Deterministic (a, b) pairs via splitmix-like mixing."""
    out = []
    x = seed
    for _ in range(num_hashes):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (x >> 3) % _MERSENNE or 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = (x >> 3) % _MERSENNE
        out.append((a, b))
    return out


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of exact (normalized) duplicates: (fp, n_docs, doc_ids)."""
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per exact-duplicate group.

    Single shuffle on the fingerprint; survivors anti-derived without a
    second scan via a window min.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(fingerprint(F.col(text_col)))
    return (
        df.withColumn("__keep", F.col(id_col) == F.min(id_col).over(w))
        .filter("__keep")
        .drop("__keep")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(text: Column, num_hashes: int = 64,
                      shingle_k: int = 5) -> Column:
    """Array<long> of minhash values, entirely in Catalyst.

    min over shingles of ((a * h + b) mod p) per permutation; h = xxhash64
    of the shingle, folded to non-negative.
    """
    hashes = F.transform(
        rolling_fingerprints(text, shingle_k),
        lambda h: F.pmod(h, F.lit(_MERSENNE)),
    )
    sig = []
    for a, b in _perm_params(num_hashes):
        sig.append(
            F.array_min(
                F.transform(
                    hashes,
                    lambda h: F.pmod(
                        h * F.lit(a) + F.lit(b), F.lit(_MERSENNE)
                    ),
                )
            )
        )
    return F.array(*sig)


def lsh_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Array<struct<band:int, key:long>> — one bucket key per band."""
    out = []
    for b in range(bands):
        band_slice = F.slice(sig, b * rows_per_band + 1, rows_per_band)
        out.append(
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.array_join(
                    F.transform(band_slice, lambda v: v.cast("string")), ","
                )).alias("key"),
            )
        )
    return F.array(*out)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two string arrays (distinct semantics)."""
    ad, bd = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(ad, bd))
    union = F.size(ad) + F.size(bd) - inter
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int = 64, bands: int = 16,
                      shingle_k: int = 5,
                      min_jaccard: float = 0.5) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via banded LSH.

    Plan shape: one scan computing signatures + shingles → explode bands
    (×bands rows of small (band,key,id,shingles)) → self-join on (band,key)
    (shuffle keyed by bucket; only colliding candidates meet) →
    dedup pairs → exact Jaccard verification on the candidates only.
    """
    rows_per_band = num_hashes // bands
    sigs = df.select(
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col), shingle_k).alias("sh"),
        lsh_bands(
            minhash_signature(F.col(text_col), num_hashes, shingle_k),
            bands, rows_per_band,
        ).alias("bands"),
    )
    exploded = sigs.select(
        "doc_id", "sh", F.explode("bands").alias("bk")
    ).select("doc_id", "sh", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    left = exploded.alias("l")
    right = exploded.alias("r")
    cand = (
        left.join(right, ["band", "key"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select(
            "id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard")
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text: Column, bits: int = 64, shingle_k: int = 2) -> Column:
    """SimHash signature: sign-sum of feature-hash bits, via aggregate over
    a per-bit counter array (JVM higher-order functions)."""
    feats = rolling_fingerprints(text, shingle_k)
    zero = F.array_repeat(F.lit(0), bits)
    counts = F.aggregate(
        feats,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda i: F.when(
                    F.shiftright(h, i.cast("int")).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1)),
            ),
            lambda a, b: a + b,
        ),
    )
    return F.aggregate(
        F.zip_with(
            counts,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda c, i: F.when(c > 0, F.shiftleft(F.lit(1).cast("long"), i.cast("int"))).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 6, shingle_k: int = 2) -> DataFrame:
    """Near-dup pairs by SimHash banding (4×16-bit bands → candidates →
    Hamming verification)."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        simhash(F.col(text_col), 64, shingle_k).alias("sh"),
    )
    banded = sh.select(
        "doc_id", "sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("sh"), 16 * b)
                    .bitwiseAND(F.lit(0xFFFF)).alias("key"),
                )
                for b in range(4)
            ])
        ).alias("bk"),
    ).select("doc_id", "sh", "bk.band", "bk.key")
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(r, ["band", "key"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            hamming64(F.col("l.sh"), F.col("r.sh")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (direct, for verification / small candidate sets)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        k: int = 3, min_jaccard: float = 0.8,
                        group_col: Column | None = None) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs.

    ``group_col`` restricts the self-join to a blocking key (default: exact
    fingerprint prefix bucketing would be a full cross join — callers at
    scale MUST pass a blocking key; tests may pass a constant).
    """
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col), k).alias("sh"),
        (group_col if group_col is not None else F.lit(0)).alias("grp"),
    )
    l, r = sh.alias("l"), sh.alias("r")
    return (
        l.join(r, "grp")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            jaccard(F.col("l.sh"), F.col("r.sh")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
