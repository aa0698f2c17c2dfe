"""Seeded adversarial fuzz for the round-6 training-prep operators:
c4_quality, dedupe_doc_lines and pack_token_blocks each checked against
an INDEPENDENT pure-Python reference over whitespace-nasty corpora
(CRLF, tab, vertical tab, form feed, NBSP, empty/null docs).  The
references re-implement the semantics with `re` + hashlib — same
explicit character classes, none of the Spark code paths."""

import hashlib
import random
import re

import pytest
from pyspark.sql import functions as F

from katydid_haskell_spark.operators import chunking as ck
from katydid_haskell_spark.operators import mixing as mx
from katydid_haskell_spark.operators import textops as tx

WS_CHARS = [" ", "\t", "\x0B", "\f", "\r", "  ", " \t"]
WORDS = ["alpha", "Beta", "GAMMA", "d1g1t", "x", "javascript",
         "Lorem", "ipsum", "{brace}", "word's", " joined"]
ENDINGS = ["", ".", "!", "?", '"', ",", ":"]


def _gen_doc(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randrange(0, 8)):
        n = rng.randrange(0, 9)
        body = ""
        for _ in range(n):
            body += rng.choice(WORDS) + rng.choice(WS_CHARS)
        line = (rng.choice(WS_CHARS) if rng.random() < 0.4 else "") \
            + body.rstrip(" ") + rng.choice(ENDINGS) \
            + (rng.choice(WS_CHARS) if rng.random() < 0.4 else "")
        lines.append(line)
        if lines and rng.random() < 0.3:   # force duplicate lines
            lines.append(rng.choice(lines))
    return "\n".join(lines)


_WS_RE = re.compile(tx.WS_RE)
_TRIM_RE = re.compile(tx.LINE_TRIM_RE)


def _lines(text):
    out = []
    for raw in (text or "").split("\n"):
        t = _TRIM_RE.sub("", raw)
        if t:
            out.append(t)
    return out


def _norm(s):
    return re.sub("^ | $", "", _WS_RE.sub(" ", s.lower()))


def _wc(s):
    return len([w for w in _WS_RE.split(s) if w])


def _ref_c4(text, min_words=5, min_kept=3):
    ls = _lines(text)
    kept = [l for l in ls
            if l[-1:] in (".", "!", "?", '"') and _wc(l) >= min_words
            and "javascript" not in l.lower()]
    t = text or ""
    has_lorem = "lorem ipsum" in t.lower()
    has_brace = "{" in t
    return (len(ls), len(kept), _wc("\n".join(kept)),
            len([l for l in ls if "javascript" in l.lower()]),
            has_lorem, has_brace,
            has_lorem or has_brace or len(kept) < min_kept,
            "\n".join(kept))


def _ref_dedupe(text):
    ls = _lines(text)
    seen, kept = set(), []
    for l in ls:
        n = _norm(l)
        if n not in seen:
            seen.add(n)
            kept.append(l)
    return (len(ls), len(kept), len(ls) - len(kept), "\n".join(kept))


@pytest.fixture(scope="module")
def fuzz_docs(spark):
    rng = random.Random(20260817)
    rows = [(i, _gen_doc(rng)) for i in range(120)]
    rows += [(120, None), (121, ""), (122, "\r\n\x0B\f")]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_fuzz_c4_matches_reference(spark, fuzz_docs):
    rows, df = fuzz_docs
    got = {r["doc_id"]: r for r in
           tx.c4_quality(df, "doc_id", "text").collect()}
    for i, text in rows:
        want = _ref_c4(text)
        g = got[i]
        have = (g["n_lines"], g["n_kept"], g["kept_words"],
                g["n_js_lines"], g["has_lorem"], g["has_brace"],
                g["flagged"], g["clean_text"])
        assert have == want, (i, text)


def test_fuzz_dedupe_lines_matches_reference(spark, fuzz_docs):
    rows, df = fuzz_docs
    got = {r["doc_id"]: r for r in
           tx.dedupe_doc_lines(df, "doc_id", "text").collect()}
    for i, text in rows:
        want = _ref_dedupe(text)
        g = got[i]
        assert (g["n_lines"], g["n_kept"], g["n_removed"],
                g["clean_text"]) == want, (i, text)


def test_fuzz_pack_blocks_matches_reference(spark, fuzz_docs):
    rows, df = fuzz_docs
    B, S, seed = 16, 4, "fz-v1"
    got = sorted(map(tuple, ck.pack_token_blocks(
        df, "doc_id", "text", block_words=B, seed=seed,
        n_shards=S).collect()))
    # reference: same seeded permutation + cumulative fold in Python
    word_re = re.compile(r"[^a-zA-Z0-9']+")

    def nwords(t):
        return len([w for w in word_re.split((t or "").lower()) if w])

    def hh(i):
        return hashlib.md5(f"{seed}\x1f{i}".encode()).hexdigest()

    per_shard = {}
    for i, text in rows:
        h = hh(i)
        shard = int(h[:2], 16) % S
        per_shard.setdefault(shard, []).append((h, i, nwords(text)))
    want = []
    for shard, items in per_shard.items():
        items.sort()
        off = 0
        for pos, (h, i, nw) in enumerate(items):
            first = off // B
            last = max(first, (off + nw - 1) // B)
            want.append((i, shard, pos, nw, off, first, last))
            off += nw
    assert got == sorted(want)
