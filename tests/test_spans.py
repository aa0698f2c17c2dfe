"""duplicate_spans / remove_duplicate_spans — ExactSubstr-family
duplicate-span detection (hand-computed cases, Python-reference parity,
plan-shape guard: no text through an exchange)."""

import re

import pytest
from pyspark.sql import functions as F

from katydid_haskell_spark.operators import spans as sp
from katydid_haskell_spark.operators.textops import _WORD_SPLIT

DOCS = [
    (1, "a b c d e f g x y z"),
    (2, "q r a b c d e f g w"),
    (3, "m n o p q"),
    (4, "a b c 1 2 3 4 5 e f g"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _words(t):
    return [w for w in re.split(_WORD_SPLIT, t.lower()) if w]


def _ref_spans(docs, n, min_docs, min_words=None):
    """Brute-force reference: gram -> doc set, islands merged in Python."""
    grams = {}
    for did, t in docs:
        ws = _words(t)
        for i in range(len(ws) - n + 1):
            grams.setdefault(" ".join(ws[i:i + n]), set()).add(did)
    dup = {g for g, ds in grams.items() if len(ds) >= min_docs}
    out = []
    for did, t in docs:
        ws = _words(t)
        pos = [i for i in range(len(ws) - n + 1)
               if " ".join(ws[i:i + n]) in dup]
        runs = []
        for p in pos:
            if runs and p <= runs[-1][-1] + n:
                runs[-1].append(p)
            else:
                runs.append([p])
        for r in runs:
            s, e = r[0], r[-1] + n - 1
            if min_words is None or e - s + 1 >= min_words:
                out.append((did, s, e, e - s + 1, len(r)))
    return sorted(out)


def test_hand_computed_spans(spark, docs_df):
    got = sorted(tuple(r) for r in
                 sp.duplicate_spans(docs_df, "doc_id", "text", n=3).collect())
    # d1: one merged span over words 0..6 ("a b c d e f g"), 5 grams.
    # d2: the same 7-word run at offset 2.  d3: nothing.
    # d4: two islands — "a b c" at [0,2] and "e f g" at [8,10].
    assert got == [
        (1, 0, 6, 7, 5),
        (2, 2, 8, 7, 5),
        (4, 0, 2, 3, 1),
        (4, 8, 10, 3, 1),
    ]
    assert got == _ref_spans(DOCS, n=3, min_docs=2)


def test_min_words_filter(spark, docs_df):
    got = sorted(tuple(r) for r in sp.duplicate_spans(
        docs_df, "doc_id", "text", n=3, min_words=5).collect())
    assert got == [(1, 0, 6, 7, 5), (2, 2, 8, 7, 5)]
    assert got == _ref_spans(DOCS, n=3, min_docs=2, min_words=5)


def test_reference_parity_generated(spark):
    """Seeded corpus with planted shared sentences + unique filler."""
    shared = ["the quick brown fox jumps over the lazy dog",
              "lorem ipsum dolor sit amet consectetur"]
    docs = []
    for i in range(40):
        parts = [f"u{i}w{j}" for j in range(i % 7 + 2)]
        if i % 3 == 0:
            parts.insert(1, shared[0])
        if i % 5 == 0:
            parts.append(shared[1])
        docs.append((i, " ".join(parts)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 sp.duplicate_spans(df, "doc_id", "text", n=4).collect())
    assert got == _ref_spans(docs, n=4, min_docs=2)
    assert got  # planted duplicates must actually surface


def test_min_docs_threshold(spark, docs_df):
    # "a b c" and "e f g" occur in 3 docs; the bcd/cde/def middles in 2.
    got = sorted(tuple(r) for r in sp.duplicate_spans(
        docs_df, "doc_id", "text", n=3, min_docs=3).collect())
    assert got == _ref_spans(DOCS, n=3, min_docs=3)
    assert (1, 0, 2, 3, 1) in got and (4, 8, 10, 3, 1) in got
    # the 7-word merged span must be gone at min_docs=3
    assert all(r[3] == 3 for r in got)


def test_remove_duplicate_spans(spark, docs_df):
    got = {r.doc_id: (r.clean_text, r.n_removed_words) for r in
           sp.remove_duplicate_spans(
               docs_df, "doc_id", "text", n=3).collect()}
    assert got[1] == ("x y z", 7)
    assert got[2] == ("q r w", 7)
    assert got[3] == ("m n o p q", 0)   # untouched doc flows through
    assert got[4] == ("1 2 3 4 5", 6)
    assert set(got) == {1, 2, 3, 4}


def test_removal_plan_no_text_exchange_under_guard(spark, docs_df):
    """With the cut set under BROADCAST_MAX_CUTS the removal join is an
    explicit broadcast: document text reaches the rebuild without ever
    crossing a shuffle exchange."""
    out = sp.remove_duplicate_spans(docs_df, "doc_id", "text", n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for l in plan.splitlines():
        if "Exchange" in l and "Broadcast" not in l:
            assert "text" not in l, f"text crosses a shuffle: {l}"


def test_removal_shuffle_branch_same_output(spark, docs_df,
                                            monkeypatch):
    """Forcing the over-threshold branch (shuffle join) must produce
    byte-identical output — the guard changes strategy, never
    semantics."""
    want = sorted(map(tuple, sp.remove_duplicate_spans(
        docs_df, "doc_id", "text", n=3).collect()))
    monkeypatch.setattr(sp, "BROADCAST_MAX_CUTS", 0)
    got = sorted(map(tuple, sp.remove_duplicate_spans(
        docs_df, "doc_id", "text", n=3).collect()))
    assert got == want


def test_fuzz_random_corpora(spark):
    """Seeded adversarial fuzz: single-letter words over a 6-symbol
    alphabet make gram collisions dense (overlapping islands, spans
    touching doc edges, whole-doc spans), random (n, min_docs,
    min_words) per seed; detection AND removal must match the
    brute-force Python reference exactly."""
    import random

    for seed in (7, 41, 1999):
        rng = random.Random(seed)
        n = rng.choice([2, 3, 4])
        min_docs = rng.choice([2, 3])
        min_words = rng.choice([None, n + 1])
        docs = [(i, " ".join(rng.choice("abcdef")
                             for _ in range(rng.randrange(0, 14))))
                for i in range(60)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        want = _ref_spans(docs, n=n, min_docs=min_docs,
                          min_words=min_words)
        got = sorted(tuple(r) for r in sp.duplicate_spans(
            df, "doc_id", "text", n=n, min_docs=min_docs,
            min_words=min_words).collect())
        assert got == want, f"seed {seed}: {got} != {want}"
        assert want, f"seed {seed}: fuzz produced no spans (weak case)"
        # removal parity from the same reference spans
        drops = {}
        for did, s, e, _, _ in want:
            drops.setdefault(did, set()).update(range(s, e + 1))
        want_clean = {}
        for did, t in docs:
            ws = _words(t)
            kept = [w for i, w in enumerate(ws)
                    if i not in drops.get(did, ())]
            want_clean[did] = (" ".join(kept),
                              len(ws) - len(kept))
        got_clean = {r.doc_id: (r.clean_text, r.n_removed_words)
                     for r in sp.remove_duplicate_spans(
                         df, "doc_id", "text", n=n, min_docs=min_docs,
                         min_words=min_words).collect()}
        assert got_clean == want_clean, f"seed {seed}"


def test_spans_plan_no_text_exchange(spark, docs_df):
    """Scale guard: gram hashing happens map-side; every exchange in the
    span plan carries only (h, id, pos) — document text never shuffles."""
    out = sp.duplicate_spans(docs_df, "doc_id", "text", n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    ex_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert ex_lines, "expected gram-count + window exchanges"
    for l in ex_lines:
        assert "text" not in l, f"text crosses an exchange: {l}"
