"""Benchmark decontamination for training-data pipelines.

Flags training documents that share word n-grams with an evaluation /
benchmark set (the GPT-3 appendix-C / Dolma-style 13-gram collision
check, parameterized n).  The 100-TB shape: the benchmark side is tiny
(thousands of eval documents) versus the corpus, so its distinct n-grams
are BROADCAST and the corpus side is a map-side explode + broadcast hash
join — the only shuffle is the final per-doc_id partial-aggregated
count, never the raw text.

Both sides use the shared word split from ``textops`` so the DuckDB
oracle can re-derive the identical gram sets in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from katydid_haskell_spark.operators.textops import _word_ngrams, words


def _distinct_grams(df: DataFrame, id_col: str, text_col: str,
                    n: int, out_id: str) -> DataFrame:
    """(out_id, gram) rows: distinct word n-grams per document.

    Documents with fewer than n words contribute no grams (they cannot
    collide at length n) — mirrored exactly in the SQL oracle.
    """
    ws = words(F.col(text_col))
    return (
        df.select(F.col(id_col).alias(out_id),
                  F.array_distinct(_word_ngrams(ws, n)).alias("grams"))
        .select(out_id, F.explode("grams").alias("gram"))
    )


def ngram_overlap(train: DataFrame, eval_set: DataFrame, id_col: str,
                  text_col: str, n: int = 13) -> DataFrame:
    """Per training document: overlap with the benchmark n-gram set.

    Returns (id_col, n_hit_grams, n_eval_docs) for every training doc
    sharing at least one word n-gram with any eval doc:

    - ``n_hit_grams``: distinct training-doc n-grams that appear in ANY
      eval doc,
    - ``n_eval_docs``: distinct eval docs sharing at least one n-gram.

    ``eval_set`` is assumed small (benchmark suites are) and broadcast.
    """
    tg = _distinct_grams(train, id_col, text_col, n, id_col)
    eg = _distinct_grams(eval_set, id_col, text_col, n, "eval_id")
    hits = tg.join(F.broadcast(eg), "gram")
    return (
        hits.groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("n_hit_grams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


def decontaminate(train: DataFrame, eval_set: DataFrame, id_col: str,
                  text_col: str, n: int = 13,
                  min_hits: int = 1) -> DataFrame:
    """Training rows with fewer than ``min_hits`` benchmark n-gram
    collisions — the kept (clean) corpus, original columns preserved."""
    dirty = (
        ngram_overlap(train, eval_set, id_col, text_col, n)
        .filter(F.col("n_hit_grams") >= min_hits)
        .select(id_col)
    )
    return train.join(dirty, id_col, "left_anti")
