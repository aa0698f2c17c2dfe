"""Exact-substring duplicate-span detection for training-data dedup.

Finds, per document, the maximal word-level spans every one of whose
length-``n`` word grams also occurs in at least ``min_docs`` distinct
documents — the ExactSubstr family (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better") re-expressed for Spark.
The reference method builds a corpus-wide suffix array, which is
inherently sequential; the distributed equivalent is hashed fixed-width
grams plus a gaps-and-islands merge, the standard Spark-native
approximation (a true substring match of >= n words is exactly a run of
matching n-grams).

100-TB shape — raw text NEVER crosses a shuffle:

* grams are reduced map-side to md5 hex digests (bounded 32 bytes
  regardless of gram length; md5 rather than xxhash64 so the DuckDB
  oracle derives bit-identical keys);
* the gram-frequency shuffle carries (hash, doc_id) only;
* the island merge windows over (doc_id, pos) integers;
* the optional removal step rebuilds text map-side after an id-keyed
  join of integer cut lists.

Word semantics are shared with the rest of the curation family
(``textops._WORD_SPLIT``), so the SQL oracle re-derives identical gram
sets with ``_WORDS_SQL``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from katydid_haskell_spark.operators.textops import _WORD_SPLIT

#: counted broadcast guard for the cut-list join in
#: :func:`remove_duplicate_spans` — one (id, array<int-pair>) row per
#: AFFECTED doc; 2M rows of small int arrays is comfortably
#: executor-memory small, the same order as decontam's gram guard.
#: Under the threshold the join is an explicit broadcast (document text
#: never crosses an exchange); past it the id-keyed shuffle join is the
#: documented one-time text move.
BROADCAST_MAX_CUTS = 2_000_000


def gram_positions_udf(n: int):
    """Arrow-vectorized (pos, h) pairs: every word ``n``-gram of the
    document as (0-based start position in the filtered word list,
    md5 hex of the gram text).

    Same word split as ``textops.words`` / the SQL oracle; documents
    with fewer than ``n`` words emit no grams (they cannot participate
    in a length-``n`` match).  md5 is computed in the UDF so gram TEXT
    never even leaves the Python worker — only 32-byte digests cross
    Arrow.  The Catalyst HOF formulation is the slow path here for the
    same reason as ``decontam.distinct_ngrams_udf`` (array HOFs
    evaluate interpreted, re-running the split per element).

    The gram text is sliced out of the single space-joined word string
    by byte offsets (" ".join(ws[i:i+n]) == joined[start_i:end_{i+n-1}]
    by construction) so the per-gram cost is one bytes slice + one md5,
    not an n-way join — encoding happens once per document.
    """
    import hashlib

    from pyspark.sql.functions import pandas_udf

    word_re = re.compile(_WORD_SPLIT)

    @pandas_udf("array<struct<pos:bigint,h:string>>")
    def grams(texts: pd.Series) -> pd.Series:
        md5 = hashlib.md5
        out = []
        for t in texts:
            ws = [w for w in word_re.split((t or "").lower()) if w]
            if len(ws) < n:
                out.append([])
                continue
            enc = " ".join(ws).encode()
            starts, ends, pos = [], [], 0
            for w in ws:
                starts.append(pos)
                pos += len(w.encode())
                ends.append(pos)
                pos += 1
            out.append([
                (i, md5(enc[starts[i]:ends[i + n - 1]]).hexdigest())
                for i in range(len(ws) - n + 1)])
        return pd.Series(out)

    return grams


def duplicate_gram_positions(df: DataFrame, id_col: str, text_col: str,
                             n: int = 5, min_docs: int = 2) -> DataFrame:
    """(id, pos) rows for every gram position whose gram occurs in at
    least ``min_docs`` DISTINCT documents.

    ONE Python pass: the per-doc (pos, h) gram array is computed once
    and persisted (counts-and-digests only — text is never cached, the
    ``_doc_bigram_counts`` discipline); the frequency side derives the
    per-doc DISTINCT hash set from the same array with JVM
    ``array_distinct`` (per-doc dedup means a plain partial-aggregated
    COUNT over the exploded hashes equals COUNT(DISTINCT doc), without
    the two-phase distinct shuffle).  The frequency count shuffles bare
    32-byte hashes and the semi-join shuffles (h, id, pos) — bounded
    per row regardless of document or gram length.
    """
    g_arr = (
        df.select(F.col(id_col),
                  gram_positions_udf(n)(F.col(text_col)).alias("pg"))
        .persist()
    )
    g = (
        g_arr.select(F.col(id_col), F.explode("pg").alias("pg"))
        .select(F.col(id_col), F.col("pg.pos").alias("pos"),
                F.col("pg.h").alias("h"))
    )
    dup = (
        g_arr.select(F.explode(F.array_distinct(
            F.transform(F.col("pg"), lambda x: x["h"]))).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    return g.join(dup, "h", "left_semi").select(id_col, "pos")


def duplicate_spans(df: DataFrame, id_col: str, text_col: str,
                    n: int = 5, min_docs: int = 2,
                    min_words: int | None = None) -> DataFrame:
    """Maximal duplicated word spans per document.

    Two duplicated gram positions p < q belong to one span iff
    q <= p + n (their word windows [p, p+n-1] and [q, q+n-1] union to a
    contiguous run) — a pure integer gaps-and-islands window.  Output:
    (id, span_start, span_end, span_words, n_grams), positions 0-based
    inclusive over the filtered word list; ``min_words`` drops spans
    shorter than that many words.
    """
    p = duplicate_gram_positions(df, id_col, text_col, n, min_docs)
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = (
        p.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "brk",
            F.when(F.col("prev").isNull()
                   | (F.col("pos") > F.col("prev") + n), 1).otherwise(0))
        .withColumn(
            "island",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)))
    )
    spans = (
        isl.groupBy(id_col, "island")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + F.lit(n - 1)).alias("span_end"),
             (F.max("pos") - F.min("pos") + F.lit(n)).alias("span_words"),
             F.count(F.lit(1)).alias("n_grams"))
        .drop("island")
    )
    if min_words is not None:
        spans = spans.filter(F.col("span_words") >= min_words)
    return spans


def remove_duplicate_spans(df: DataFrame, id_col: str, text_col: str,
                           n: int = 5, min_docs: int = 2,
                           min_words: int | None = None) -> DataFrame:
    """Cut duplicated spans out of each document.

    Returns (id, clean_text, n_removed_words): the document's filtered
    word list with every span word removed, re-joined with single
    spaces.  Like the reference method this NORMALIZES the survivor
    (the suffix-array cut in Lee et al. drops raw bytes; here the word
    split is the canonical unit, shared with the gram math — original
    inter-word whitespace is not preserved).

    Scale shape: the only non-integer payload crossing an exchange is
    the id-keyed join of per-doc cut lists (arrays of int pairs, one
    row per affected doc); the re-split + cut + re-join runs map-side.
    """
    spans = duplicate_spans(df, id_col, text_col, n, min_docs, min_words)
    cuts = (
        spans.groupBy(id_col)
        .agg(F.collect_list(
            F.struct(F.col("span_start"), F.col("span_end"))).alias("cuts"))
    )
    # counted guard, not a size estimate: Catalyst cannot see through
    # the UDF pipeline feeding `cuts`, so decide the strategy from an
    # early-exit count (LIMIT k+1 — a huge cut set never pays a full
    # count) the way decontam._semi_join_guarded does.  Compute-once
    # discipline (round 7, same as decontam): `cuts` is the WHOLE
    # duplicate_spans pipeline — persist it for the probe, and under
    # the threshold pull the guard-bounded rows to the driver and
    # broadcast a local copy (the driver hop BroadcastExchange pays
    # anyway), so the span pipeline never runs twice; over it, drop the
    # cache and let the shuffle join recompute rather than leak.
    cuts = cuts.persist()
    try:
        # one job, not two (r9): the guard-bounded LIMIT k+1 collect IS
        # the probe — k+1 rows back means over-threshold; <= k rows
        # back is already the complete cut set to broadcast
        rows = cuts.limit(BROADCAST_MAX_CUTS + 1).collect()
        if len(rows) <= BROADCAST_MAX_CUTS:
            local = df.sparkSession.createDataFrame(
                rows, schema=cuts.schema)
            build = F.broadcast(local)
        else:
            build = cuts
        joined = df.join(build, id_col, "left_outer")
    finally:
        cuts.unpersist()

    word_re = re.compile(_WORD_SPLIT)

    def rebuild(batches):
        for pdf in batches:
            texts, cut_lists = pdf[text_col], pdf["cuts"]
            clean, removed = [], []
            for t, cl in zip(texts, cut_lists):
                ws = [w for w in word_re.split((t or "").lower()) if w]
                if cl is None or (isinstance(cl, float)) or len(cl) == 0:
                    clean.append(" ".join(ws))
                    removed.append(0)
                    continue
                drop = set()
                for c in cl:
                    s, e = int(c["span_start"]), int(c["span_end"])
                    drop.update(range(s, e + 1))
                kept = [w for i, w in enumerate(ws) if i not in drop]
                clean.append(" ".join(kept))
                removed.append(len(ws) - len(kept))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "clean_text": clean,
                "n_removed_words": pd.Series(removed, dtype="int64"),
            })

    schema = (f"{id_col} {dict(df.dtypes)[id_col]}, clean_text string, "
              "n_removed_words bigint")
    return joined.mapInPandas(rebuild, schema=schema)
