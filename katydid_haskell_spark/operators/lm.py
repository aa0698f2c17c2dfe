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


def _doc_bigram_counts(df: DataFrame, text_col: str,
                       id_col: str) -> DataFrame:
    """(id, text) → persisted (id, bg, cnt): adjacent canonical-word
    pairs extracted map-side, one partially-aggregated count shuffle.

    persist() is load-bearing: Spark's exchange reuse does not
    deduplicate the multiple consumers (self-join re-aliasing gives each
    branch distinct exprIds), so without it the corpus-scale text scan +
    bigram explode would run once per consumer (measured: 10 FileScans
    at sf0.01 for bigram_lm_score's three).  The cached table is
    (id, bg, cnt) — counts only, text never cached, spillable
    MEMORY_AND_DISK."""
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
    return (bg.groupBy(id_col, "bg")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .persist())


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
    doc_bg = _doc_bigram_counts(df, text_col, id_col)
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


def dsir_score(df: DataFrame, target_pred, text_col: str = "text",
               id_col: str = "doc_id",
               scale: int = 1_000_000) -> DataFrame:
    """DSIR-style importance scoring for data selection (Xie et al. 2023,
    public): score every document by how much more likely it is under a
    bigram model of the TARGET slice than under the model of the raw
    corpus.  ``target_pred`` is a boolean Column over ``id_col`` naming
    the in-domain slice (e.g. ``F.col("doc_id") % 7 == 0``).

    Exact-integer adaptation of the log-ratio: per bigram occurrence the
    contribution is ``q_t - q_r`` where each q is the add-1-smoothed
    probability quantized ONCE as ``(scale*(c2+1)) DIV (c1+V)`` —
    positive-integer division (Spark DIV == DuckDB // on positives,
    the bigram_lm_score discipline).  Per-doc sums are BIGINTs
    (order-independent); ``dscore = t_sum - r_sum`` is an exact BIGINT
    difference (a float log-ratio would never survive the value-hash
    gate).  Bigrams unseen by the target model back off through the
    SAME formula with c2_t = 0 and c1_t = the target count of the left
    word (0 if unseen); V_t is floored at 1 on both sides so an empty
    target slice cannot divide by zero.

    Returns (doc_id, n_bigrams, t_sum, r_sum, dscore) for every input
    row; docs with fewer than two words score zeros.  Selection is the
    caller's: top-k by (dscore DESC, id) is the vocab_topk
    TakeOrderedAndProject shape.

    100-TB shape: text never crosses an exchange — the persisted
    (id, bg, cnt) table feeds the raw model, the target model (a filter
    of the same cached counts) and the probe; both models are
    vocabulary-sized; the smoothing scalars ride as broadcast one-row
    joins; the probe joins are bg/w1-keyed (AQE-skew-handled hot
    bigrams, the bigram_lm_score reading).
    """
    doc_bg = _doc_bigram_counts(df, text_col, id_col)

    def model_parts(src):
        c2 = (src.groupBy("bg")
              .agg(F.sum("cnt").cast("long").alias("c2"))
              .withColumn("w1", F.element_at(F.split(F.col("bg"), " "), 1)))
        c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
        v = c1.agg(F.greatest(F.count(F.lit(1)).cast("long"),
                              F.lit(1).cast("long")).alias("v"))
        return c2, c1, v

    c2_r, c1_r, v_r = model_parts(doc_bg)
    c2_t, c1_t, v_t = model_parts(
        doc_bg.filter(target_pred(F.col(id_col)) if callable(target_pred)
                      else target_pred))

    probe = doc_bg.withColumn(
        "w1", F.element_at(F.split(F.col("bg"), " "), 1))
    scored = (
        probe
        .join(c2_r.select("bg", F.col("c2").alias("c2_r")), "bg", "left")
        .join(c1_r.select("w1", F.col("c1").alias("c1_r")), "w1", "left")
        .join(F.broadcast(v_r.select(F.col("v").alias("v_r"))))
        .join(c2_t.select("bg", F.col("c2").alias("c2_t")), "bg", "left")
        .join(c1_t.select("w1", F.col("c1").alias("c1_t")), "w1", "left")
        .join(F.broadcast(v_t.select(F.col("v").alias("v_t"))))
        .select(
            id_col, "cnt",
            F.expr(f"({scale} * (coalesce(c2_r, 0) + 1))"
                   " DIV (coalesce(c1_r, 0) + v_r)").alias("q_r"),
            F.expr(f"({scale} * (coalesce(c2_t, 0) + 1))"
                   " DIV (coalesce(c1_t, 0) + v_t)").alias("q_t"),
        )
        .groupBy(id_col)
        .agg(F.sum("cnt").cast("long").alias("n_bigrams"),
             F.sum(F.col("cnt") * F.col("q_t")).cast("long").alias("t_sum"),
             F.sum(F.col("cnt") * F.col("q_r")).cast("long").alias("r_sum"))
    )
    return (
        df.select(id_col).join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0).cast("long"))
            .alias("n_bigrams"),
            F.coalesce("t_sum", F.lit(0).cast("long")).alias("t_sum"),
            F.coalesce("r_sum", F.lit(0).cast("long")).alias("r_sum"),
        )
        .withColumn("dscore", F.col("t_sum") - F.col("r_sum"))
    )


#: CCNet tercile fractions — repr'd into BOTH engines' SQL/exprs so the
#: cut literals are byte-identical (change together with lm_buckets_sql).
CCNET_CUTS = (1 / 3, 2 / 3)


def lm_buckets(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               scale: int = 1_000_000) -> DataFrame:
    """CCNet-style corpus partitioning (public: Wenzek et al. 2020):
    score every doc with the corpus bigram LM (:func:`bigram_lm_score`
    — exact integers, avg_q bit-identical) and split into
    head/middle/tail at the exact tercile cut points of avg_q.

    Exactness: the cuts are Spark's exact ``percentile`` (type-7
    interpolation, bit-identical to DuckDB ``quantile_cont`` — the
    quantile_profile invariant) over bit-identical avg_q values, with
    the fraction literals repr'd from the SHARED ``CCNET_CUTS``; bucket
    comparisons are then identical-double comparisons on both sides.

    100-TB shape: the cut computation is ONE exact global percentile
    pass (the documented exact-percentile global pass of the fused
    plan); at deployment scale the approx_percentile variant is the
    drop-in (never oracle-gated — the quantile_profile rule).  The
    1-row cut table broadcasts; bucketing is a map-side CASE."""
    scored = bigram_lm_score(df, text_col, id_col, scale)
    c1, c2 = CCNET_CUTS
    cuts = scored.agg(
        F.expr(f"percentile(avg_q, {c1!r})").alias("c1"),
        F.expr(f"percentile(avg_q, {c2!r})").alias("c2"))
    return (scored.join(F.broadcast(cuts))
            .select(id_col, "n_bigrams", "avg_q",
                    F.when(F.col("avg_q") >= F.col("c2"), F.lit("head"))
                    .when(F.col("avg_q") >= F.col("c1"), F.lit("middle"))
                    .otherwise(F.lit("tail")).alias("bucket")))
