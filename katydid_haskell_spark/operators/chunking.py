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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from katydid_haskell_spark.operators.textops import n_words, words


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


def pack_token_blocks(df: DataFrame, id_col: str,
                      text_col: str | None = None,
                      block_words: int = 1024,
                      seed: str = "shuffle-v1",
                      n_shards: int = 16,
                      n_words_col: str | None = None) -> DataFrame:
    """Concat-and-chunk sequence packing: where does each document land
    in the fixed-width training-block stream?

    The standard LM pretraining recipe concatenates documents in a
    deterministic shuffled order and splits the token stream into
    fixed-size blocks, letting documents straddle block boundaries (no
    padding waste).  This computes, per document:

      (id, shard, pos, n_words, offset, first_block, last_block)

    where ``offset`` is the document's 0-based word offset inside its
    shard's stream and ``first_block``/``last_block`` the 0-based block
    indices it touches (``block_words`` words per block).  Word counts
    use the curation family's canonical split, and the order is the
    seeded-md5 permutation of :func:`mixing.shard_shuffle` — both pure
    functions of (seed, id), so any engine re-derives identical packing.

    100-TB shape: one narrow shuffle.  The cumulative sum runs over a
    (id, digest, n_words) projection partitioned by shard — text never
    moves, each shard is one task's sequential window, and the md5
    prefix keeps shard sizes uniform by construction.  Size
    ``n_shards`` to the cluster exactly as for ``shard_shuffle``.

    Empty documents (0 words) occupy no stream positions; they report
    the block the stream stood at (``first_block == last_block``).

    Pass ``n_words_col`` instead of ``text_col`` when the word count is
    already computed upstream (e.g. a pipeline that consumed the text
    map-side earlier) — the packing then never touches text at all.
    """
    from katydid_haskell_spark.operators.mixing import (_SEP,
                                                        shard_expr)

    if block_words < 1:
        raise ValueError("block_words must be >= 1")
    if (text_col is None) == (n_words_col is None):
        raise ValueError("pass exactly one of text_col / n_words_col")
    h = F.md5(F.concat_ws(_SEP, F.lit(seed),
                          F.col(id_col).cast("string")))
    nw = (F.col(n_words_col).cast("long") if n_words_col
          else n_words(F.coalesce(F.col(text_col), F.lit("")))
          .cast("long"))
    d = df.select(
        F.col(id_col),
        nw.alias("n_words"),
    ).withColumn("__h", h)
    d = d.withColumn("shard", shard_expr("__h", n_shards).cast("long"))
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    offset = F.coalesce(
        F.sum("n_words").over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"))
    d = (
        d.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .withColumn("offset", offset)
    )
    first_block = F.expr(f"offset DIV {block_words}")
    last_block = F.greatest(
        first_block,
        F.expr(f"(offset + n_words - 1) DIV {block_words}"))
    return d.select(
        F.col(id_col), F.col("shard"), F.col("pos"), F.col("n_words"),
        F.col("offset"),
        first_block.cast("long").alias("first_block"),
        last_block.cast("long").alias("last_block"),
    )
