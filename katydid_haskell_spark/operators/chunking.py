"""Document chunking for training-sequence preparation.

Splits each document into fixed-width word windows (optionally
overlapping) — the standard pre-tokenization step that turns crawl
documents into model training sequences.  Pure Catalyst: the word
split, the stride sequence and the per-chunk slice/join are all
whole-stage-codegen expressions — zero Python, zero shuffles, the
output is a generator expansion of the scan itself, so the operator is
embarrassingly parallel at any corpus size.

Word semantics are the curation family's canonical split
(``textops.words`` / the oracle's ``_WORDS_SQL``), so chunk boundaries
agree bit-for-bit with every other word-level operator and the DuckDB
oracle re-derives identical chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from katydid_haskell_spark.operators.textops import words


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_words: int = 256,
                    overlap: int = 0) -> DataFrame:
    """(id, chunk_id, chunk_text, n_words) — one row per word window.

    Windows start every ``chunk_words - overlap`` words; the final
    window may be short (it is emitted with its true ``n_words`` so a
    caller can drop or pad it).  Documents with no words emit no
    chunks.  ``chunk_id`` is the 0-based window index.
    """
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    stride = chunk_words - overlap
    d = df.select(
        F.col(id_col),
        words(F.coalesce(F.col(text_col), F.lit(""))).alias("ws"))
    starts = F.when(
        F.size("ws") > 0,
        F.sequence(F.lit(0), F.size("ws") - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    e = d.select(
        F.col(id_col), F.col("ws"),
        F.posexplode(starts).alias("chunk_id", "start"))
    chunk = F.slice(F.col("ws"), F.col("start") + 1, chunk_words)
    return e.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_words"),
    )
