"""Real byte-pair-encoding tokenization: a deterministic BPE trainer +
merge-table encoder, applied map-side over the corpus.

This replaces the BPE-*ish* regex approximation (`textops.BPE_ISH`)
with the actual algorithm (Sennrich et al. 2016; the merge-ranks
application loop is the one GPT-2's tokenizer uses): train once on a
bounded word-frequency table, broadcast the merge ranks, tokenize each
word map-side with a per-worker cache.  Training is a driver-side loop
over a BOUNDED vocabulary (the IVF-trainer precedent — never the full
corpus); application is embarrassingly parallel.

Determinism: ties in pair frequency break lexicographically, so the
same corpus always yields the same merge list — the property the
oracle literals rely on (`demo_token_counts`, the auto_n_cells shared-fn
discipline).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import textops as tx

_END = "</w>"


def _word_symbols(word: str) -> Tuple[str, ...]:
    """chars + an explicit end-of-word marker (so merges can distinguish
    suffixes from mid-word sequences, the standard formulation)."""
    return tuple(word[:-1]) + (word[-1] + _END,) if word else ()


def train_bpe(word_freqs: Dict[str, int],
              n_merges: int) -> List[Tuple[str, str]]:
    """Word-frequency table → ordered merge list (most frequent pair
    first; frequency ties break lexicographically for determinism)."""
    vocab = {_word_symbols(w): f for w, f in word_freqs.items() if w}
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Dict[Tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def bpe_encode(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Apply merges in rank order (lowest rank first) until no adjacent
    pair is mergeable — the GPT-2 application loop."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def merge_ranks(merges: Sequence[Tuple[str, str]]
                ) -> Dict[Tuple[str, str], int]:
    return {tuple(m): i for i, m in enumerate(merges)}


def bpe_token_counts(df: DataFrame, merges: Sequence[Tuple[str, str]],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, text) → (doc_id, n_words, n_tokens) through the REAL BPE
    encoder, Arrow-batched: whitespace-split on the shared explicit
    class (tx.WS_RE — never \\s), each distinct word encoded once per
    batch worker (cache), token counts summed.  The merge table rides
    the closure (bounded — vocab-size merges, not corpus-scale)."""
    import re

    ws = re.compile(tx.WS_RE)
    ranks = merge_ranks(merges)
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_words", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: Dict[str, int] = {}

        def count(word: str) -> int:
            c = cache.get(word)
            if c is None:
                c = len(bpe_encode(word, ranks))
                cache[word] = c
            return c

        for b in batches:
            rows = []
            for did, t in zip(b[id_col], b[text_col]):
                words = [w for w in ws.split(t or "") if w]
                rows.append((int(did), len(words),
                             sum(count(w) for w in words)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_words", "n_tokens"])

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def word_freqs_topv(df: DataFrame, text_col: str = "text",
                    top_v: int = 24) -> DataFrame:
    """Distributed word-frequency induction for BPE training: BPE-ish
    pre-tokens (`tx.BPE_ISH`, case-folded) extracted map-side (JVM
    regexp, whole-stage codegen), ONE partially-aggregated count
    shuffle on the token key, then top-V via ``orderBy().limit()`` —
    Catalyst compiles that to TakeOrderedAndProject (per-partition
    top-k, k·P-row driver merge), so no task ever sorts the whole
    vocabulary (the vocab_topk discipline; at crawl scale the
    vocabulary is 10^9+ distinct tokens).  Ties break on token asc so
    the V-boundary is deterministic cross-engine."""
    toks = F.explode(
        F.regexp_extract_all(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            F.lit(tx.BPE_ISH), F.lit(0)))
    counts = (df.select(toks.alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("n")))
    return counts.orderBy(F.col("n").desc(), F.col("token")).limit(top_v)


def train_bpe_on_corpus(df: DataFrame, text_col: str = "text",
                        top_v: int = 24,
                        n_merges: int = 60) -> List[Tuple[str, str]]:
    """Corpus-scale BPE training: the word-frequency table is built
    DISTRIBUTED (one count shuffle + TakeOrderedAndProject), only the
    bounded top-V vocabulary is collected (V rows — vocab, never
    corpus; the IVF-trainer precedent), and the deterministic merge
    loop runs on the driver over that dict.  Encoding/apply stays
    embarrassingly parallel (`bpe_token_counts`)."""
    rows = word_freqs_topv(df, text_col, top_v).collect()
    freqs = {r["token"]: int(r["n"]) for r in rows}
    return train_bpe(freqs, n_merges)


def merges_table(spark, merges: Sequence[Tuple[str, str]]) -> DataFrame:
    """Merge list → (rank, lhs, rhs, merged) DataFrame (bounded:
    n_merges rows — tokenizer training output IS small)."""
    schema = T.StructType([
        T.StructField("rank", T.LongType()),
        T.StructField("lhs", T.StringType()),
        T.StructField("rhs", T.StringType()),
        T.StructField("merged", T.StringType()),
    ])
    rows = [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(rows, schema)


# --- the demo corpus the oracled query trains on (fixed, seedless) ----------

DEMO_WORDS = ["tokenization", "internationalization", "the", "therefore",
              "transformer", "training", "data", "datasets",
              # unseen at training time — exercise partial merges
              "retraining", "transformers", "dataset", "theorem",
              "terse", "nation", "internal", "foo"]

_DEMO_FREQS = {
    "the": 60, "data": 40, "training": 30, "tokenization": 20,
    "transformer": 15, "datasets": 12, "therefore": 10,
    "internationalization": 5,
}

DEMO_N_MERGES = 40

_demo_cache = None


def demo_merges() -> List[Tuple[str, str]]:
    global _demo_cache
    if _demo_cache is None:
        _demo_cache = train_bpe(_DEMO_FREQS, DEMO_N_MERGES)
    return _demo_cache


def demo_token_counts() -> Dict[str, int]:
    """word → token count under the demo merge table; the oracle embeds
    these as CASE literals (shared-fn discipline: both engines call THIS
    function, so the gate checks the distributed application against
    the trainer's closed form)."""
    ranks = merge_ranks(demo_merges())
    return {w: len(bpe_encode(w, ranks)) for w in DEMO_WORDS}
