"""LM-based quality scoring: a bigram language model trained
DISTRIBUTED over the corpus, scoring each document by its average
smoothed bigram probability — the CCNet/Gopher "LM filtering" family
re-expressed Spark-first.

Everything is pure Catalyst (no UDFs) and EXACT-INTEGER under the
value-hash gate: each bigram's add-1-smoothed probability is quantized
once as ``q = (scale*(c2+1)) DIV (c1+V)`` — integer division of
positive ints, identical in Spark (DIV truncates toward zero) and
DuckDB (// floors; equal on positives, the sequence_pack discipline) —
and per-doc sums of BIGINTs are order-independent, so no float
accumulation ever crosses engines.  The final ``avg_q`` is one
int/int double division on identical integers (the jaccard
discipline, deliberately unrounded).

100-TB shape: words/bigrams are extracted map-side (JVM split +
transform, whole-stage codegen); document text never crosses an
exchange — only bounded-width bigram keys and counts shuffle
(the vocab_topk/decontam discipline).  Four exchanges total:
(doc_id, bg) partial-agg count, the bg-keyed model aggregation +
w1-join (vocabulary-sized inputs), the bg-keyed probe join (AQE
skew-handled — hot bigrams like "of the" are exactly the skew-join
case), and the final doc_id rollup.  The smoothing vocabulary size V
rides the plan as a broadcast scalar — no driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textops as tx


def bigram_lm_score(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    scale: int = 1_000_000) -> DataFrame:
    """(id, text) → (doc_id, n_bigrams, score_sum, avg_q).

    The model is trained on the SAME DataFrame it scores (the usual
    corpus-filtering setup: score each doc against corpus statistics).
    Bigrams are adjacent canonical-word pairs (``tx.words`` — lowered,
    split on the shared explicit class); ``c2`` = corpus count of the
    bigram, ``c1`` = corpus count of its left word AS a bigram-left,
    ``V`` = distinct left-word vocabulary, and each occurrence scores
    the quantized add-1 probability ``(scale*(c2+1)) DIV (c1+V)``.
    Documents with fewer than two words score (0, 0, 0.0).

    ``scale`` bounds: score_sum <= scale * total_bigrams, so the
    default 1e6 keeps a 10^12-bigram corpus inside int64.
    """
    ws = tx.words(F.coalesce(F.col(text_col), F.lit("")))
    d = df.select(F.col(id_col), ws.alias("ws"))
    # adjacent pairs, map-side; explode of an empty array drops the row
    pairs = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("ws", i), F.element_at("ws", i + 1))),
    ).otherwise(F.array().cast("array<string>"))
    bg = d.select(id_col, F.explode(pairs).alias("bg"))

    # per-doc occurrence counts: ONE partially-aggregated shuffle; this
    # table then feeds BOTH the model (c2 = sum over docs) and the
    # probe.  persist() is load-bearing: Spark's exchange reuse does
    # not deduplicate the three consumers (self-join re-aliasing gives
    # each branch distinct exprIds), so without it the corpus-scale
    # text scan + bigram explode would run 3x (measured: 10 FileScans
    # at sf0.01).  The cached table is (id, bg, cnt) — counts only,
    # text never cached, spillable MEMORY_AND_DISK.
    doc_bg = (bg.groupBy(id_col, "bg")
              .agg(F.count(F.lit(1)).alias("cnt"))
              .persist())
    c2 = (doc_bg.groupBy("bg")
          .agg(F.sum("cnt").cast("long").alias("c2"))
          .withColumn("w1", F.element_at(F.split(F.col("bg"), " "), 1)))
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    v = c1.agg(F.count(F.lit(1)).cast("long").alias("v"))
    model = (c2.join(c1, "w1")
             .join(F.broadcast(v))
             .select("bg",
                     F.expr(f"({scale} * (c2 + 1)) DIV (c1 + v)")
                     .alias("q")))

    scored = (doc_bg.join(model, "bg")
              .groupBy(id_col)
              .agg(F.sum("cnt").cast("long").alias("n_bigrams"),
                   F.sum(F.col("cnt") * F.col("q")).cast("long")
                   .alias("score_sum")))
    out = (df.select(id_col).join(scored, id_col, "left")
           .select(
               F.col(id_col),
               F.coalesce("n_bigrams", F.lit(0).cast("long"))
               .alias("n_bigrams"),
               F.coalesce("score_sum", F.lit(0).cast("long"))
               .alias("score_sum")))
    return out.withColumn(
        "avg_q",
        F.when(F.col("n_bigrams") == 0, F.lit(0.0))
        .otherwise(F.col("score_sum") / F.col("n_bigrams")))
