"""Cross-encoding suite — the analogue of the reference's Suite.hs
mechanism (test/Suite.hs:46-61): ONE grammar run over THREE encodings
(JSON, XML, protobuf) of the SAME logical tree must yield ONE verdict,
through every engine that can consume the encoding.

The reference reads the external katydid testsuite corpus
(Suite.hs:74-77, github.com/katydid/testsuite) which holds json/xml/pb
renderings of shared trees; that corpus is not vendored here, so this
module GENERATES the triple encodings from logical trees directly.

Fixture trees live in the encoding-injective subset — the values every
encoding round-trips to the identical forest:

- nested dicts with int and non-empty, non-integer-looking string leaves
  (XML re-parses text ``"5"`` as Int and drops empty text, so integer
  strings / empty strings are genuine cross-encoding divergences of the
  FORMATS, not engine bugs — excluded by construction);
- exactly one root field (XML documents have one root element);
- no arrays (XML has no Int-labeled index nodes — its Int labels only
  arise from text leaves).

Engines exercised per case:
- JSON: pure derivative engine + table-VPA (+ the Spark automaton UDF in
  the Spark test);
- XML:  pure derivative engine over decode_xml (+ validate_xml_column);
- PB:   pure derivative engine over decode_protobuf
  (+ validate_protobuf_column).
"""

import json

import pytest

from katydid_haskell_spark.relapse import protobuf_source as pb
from katydid_haskell_spark.relapse.derive import Validator
from katydid_haskell_spark.relapse.labels import decode_json
from katydid_haskell_spark.relapse.parser import parse_grammar
from katydid_haskell_spark.relapse.smart import compile_grammar
from katydid_haskell_spark.relapse.vpa import try_table_validator
from katydid_haskell_spark.relapse.xml_source import decode_xml


# ---------------------------------------------------------------------------
# encoders: logical tree (single-root nested dict) → three encodings
# ---------------------------------------------------------------------------


def to_json(tree: dict) -> str:
    return json.dumps(tree)


def _xml_value(name, v):
    if isinstance(v, dict):
        inner = "".join(_xml_value(k, c) for k, c in v.items())
        return f"<{name}>{inner}</{name}>"
    return f"<{name}>{v}</{name}>"


def to_xml(tree: dict) -> str:
    assert len(tree) == 1, "XML needs exactly one root element"
    ((root, v),) = tree.items()
    return _xml_value(root, v)


def _pb_desc(tree: dict, name: str, desc: dict) -> None:
    """Register message descriptors for every dict node (field numbers in
    key order, types int64 / string / message)."""
    msg = {}
    for i, (k, v) in enumerate(tree.items(), start=1):
        if isinstance(v, dict):
            sub = f"{name}_{k}"
            _pb_desc(v, sub, desc)
            msg[i] = pb.Field(k, "message", message=sub)
        elif isinstance(v, int) and not isinstance(v, bool):
            msg[i] = pb.Field(k, "int64")
        elif isinstance(v, str):
            msg[i] = pb.Field(k, "string")
        else:
            raise TypeError(f"unsupported leaf {v!r}")
    desc[name] = msg


def _pb_encode(tree: dict, name: str, desc: dict) -> bytes:
    out = b""
    for i, (k, v) in enumerate(tree.items(), start=1):
        if isinstance(v, dict):
            out += pb.encode_message_field(
                i, _pb_encode(v, f"{name}_{k}", desc))
        elif isinstance(v, int) and not isinstance(v, bool):
            out += pb.encode_int64(i, v)
        else:
            out += pb.encode_string(i, v)
    return out


def to_protobuf(tree: dict):
    """→ (descriptor map, root message name, payload bytes)."""
    desc: dict = {}
    _pb_desc(tree, "Root", desc)
    return desc, "Root", _pb_encode(tree, "Root", desc)


# ---------------------------------------------------------------------------
# the suite: (spec, logical tree, hand-derived verdict)
# ---------------------------------------------------------------------------

DOC = {"doc": {"name": "bob", "n": 5}}
DEEP = {"doc": {"meta": {"author": {"name": "eve"}}, "n": 17}}
DOC3 = {"doc": {"name": "bob", "n": 5, "extra": 7}}
EMPTYMETA = {"doc": {"meta": {}, "n": 5, "name": "bob"}}

CASES = [
    # contains + eq, both verdicts
    ('.doc: .name == "bob"', DOC, True),
    ('.doc: .name == "alice"', DOC, False),
    # interleave: unordered field match
    ('doc: {name: == "bob"; n: == 5}', DOC, True),
    ('doc: {n: == 5; name: == "bob"}', DOC, True),
    ('doc: {name: == "bob"; n: == 6}', DOC, False),
    # concat: ordered fields
    ('doc: [name: == "bob", n: == 5]', DOC, True),
    ('doc: [n: == 5, name: == "bob"]', DOC, False),
    # numeric comparisons + and/or
    ('.doc: .n >= 5', DOC, True),
    ('.doc: (.n > 5 | .name ^= "bo")', DOC, True),
    ('.doc: (.n > 5 & .name ^= "bo")', DOC, False),
    # not
    ('doc: !(.name == "eve")', DOC, True),
    ('doc: !(.name == "bob")', DOC, False),
    # type guards
    ('.doc: .n: -> type($int)', DOC, True),
    ('.doc: .name: -> type($int)', DOC, False),
    # deep nesting
    ('.doc: .meta: .author: .name == "eve"', DEEP, True),
    ('.doc: .meta: .author: .name == "bob"', DEEP, False),
    ('doc: {meta: author: name: $= "ve"; n: < 20}', DEEP, True),
    # wildcard name over all fields
    ("doc: (_: *)*", DOC, True),
    # string functions through every decoder's text handling
    ('.doc: .name ~= "^b.b$"', DOC, True),
    ('.doc: -> eq(toLower($string), "x")', DOC, False),
    # round-6 final-session stdlib additions (mirrors golden-corpus
    # growth: length / elem / membership / prefix+not-suffix / and-band)
    ('.doc: .name: -> gt(length($string), 2)', DOC, True),
    ('.doc: .name: -> gt(length($string), 3)', DOC, False),
    ('.doc: .n: -> contains($int, []int{4,5,6})', DOC, True),
    ('.doc: .n: -> contains($int, []int{7,8})', DOC, False),
    ('.doc: .n: -> eq($int, elem([]int{4,5,6}, 1))', DOC, True),
    ('doc: {name: (^= "bo" & !($= "x")); n: == 5}', DOC, True),
    ('doc: {name: (^= "bo" & !($= "ob")); n: == 5}', DOC, False),
    ('doc: {n: -> and(ge($int, 5), lt($int, 9)); *}', DOC, True),
    ('doc: {n: -> and(ge($int, 6), lt($int, 9)); *}', DOC, False),
    ('.doc: .meta: .author: .name: -> eq(toUpper($string), "EVE")',
     DEEP, True),
    # structural: empty node across all three encodings ({} / <meta></meta>
    # / zero-length submessage), 3-field ordered concat, 2-hop refs,
    # negation over a function leaf
    ('doc: {meta: <empty>; n: == 5; name: *}', EMPTYMETA, True),
    ('doc: {meta: <empty>; n: == 6; name: *}', EMPTYMETA, False),
    ('doc: [name: *, n: *, extra: == 7]', DOC3, True),
    ('doc: [extra: *, name: *, n: *]', DOC3, False),
    ('#main = .doc: @p  #p = .meta: @q  #q = .author: .name $= "ve"',
     DEEP, True),
    ('#main = .doc: @p  #p = .meta: @q  #q = .author: .name $= "xx"',
     DEEP, False),
    ('doc: !(.name: -> gt(length($string), 2))', DOC, False),
    ('doc: !(.name: -> gt(length($string), 9))', DOC, True),
]

FIVE = {"a": {"b": {"c": {"d": {"e": "leaf", "n": 7}}}}}
MIXED = {"rec": {"title": "Spark Rules", "year": 2024,
                 "author": {"first": "ada", "last": "byron"}}}

CASES += [
    # 5-level nesting, both verdicts
    ('.a: .b: .c: .d: .e == "leaf"', FIVE, True),
    ('.a: .b: .c: .d: .e == "wrong"', FIVE, False),
    ('.a: .b: .c: .d: {e: *; n: >= 7}', FIVE, True),
    # length + substring + suffix through each decoder's text handling
    ('.rec: .title: -> eq(length($string), 11)', MIXED, True),
    ('.rec: .title *= "ark R"', MIXED, True),
    ('.rec: .author: .last $= "ron"', MIXED, True),
    ('.rec: .author: .last ^= "by"', MIXED, True),
    ('.rec: .author: .first $= "ron"', MIXED, False),
    # int leaf through XML's text re-parse and protobuf varint
    ('.rec: (.year > 2020 & .year < 2030)', MIXED, True),
    ('.rec: .year: -> type($string)', MIXED, False),
    # negation over a deep path
    ('rec: !(.author: .first == "ada")', MIXED, False),
    # concat at depth: author fields are ordered (first, last)
    ('.rec: .author: [first: *, last: *]', MIXED, True),
    ('.rec: .author: [last: *, first: *]', MIXED, False),
]

# round 6: testsuite-family shapes the 33-case set sampled thinly —
# vertical recursion over every encoding, name choices, ZAny concat
# segments over dict children, Contains nested under interleave, Not at
# depth, and int-vs-string leaf typing (XML re-parses "2024" text as Int,
# so a string-literal compare against an int leaf must be False through
# EVERY decoder, not just JSON's)
REC = {"doc": {"v": "aa", "next": {"v": "bb", "next": {"v": "cc"}}}}
REC_BAD = {"doc": {"v": "aa", "next": {"v": "bb", "next": {"v": 3}}}}
ONE = {"doc": {"v": "x"}}
_CHAIN_STR = ('#main = .doc: @chain\n'
              '#chain = {v: -> type($string); (next: (@chain)?)?}')

CASES += [
    # vertical recursion (Smart.hs:46-47 parity) through all 3 decoders
    (_CHAIN_STR, REC, True),
    (_CHAIN_STR, REC_BAD, False),   # deepest leaf is an int
    ('#main = .doc: @chain\n#chain = {v: *; (next: (@chain)?)?}',
     ONE, True),                    # recursion base case
    # name-choice patterns
    ('.doc: .(name|title) == "bob"', DOC, True),
    ('.doc: .(title|subtitle) == "bob"', DOC, False),
    # ZAny segment inside ordered children
    ('doc: [*, n: == 5]', DOC, True),
    ('doc: [*, name: == "bob"]', DOC, False),  # name is first, not last
    # Contains nested under an interleave branch
    ('doc: {meta: .author: .name $= "ve"; n: *}', DEEP, True),
    ('doc: {meta: .author: .name $= "xx"; n: *}', DEEP, False),
    # int leaf vs int literal vs string literal
    ('.rec: .year == 2024', MIXED, True),
    ('.rec: .year == "2024"', MIXED, False),
    # Not at depth 4
    ('.a: .b: .c: .d: !(.e == "leaf")', FIVE, False),
    ('.a: .b: .c: .d: !(.e == "nope")', FIVE, True),
]


# round-6 late additions — the families the corpus growth pinned at the
# verdict level, here proven encoding-agnostic as well: double negation,
# Or-with-emptySet absorption, name choice under interleave, references
# entering mid-path, optional segments over dict children, Not around a
# positional author match
CASES += [
    ('.doc: !(!(.name == "bob"))', DOC, True),
    ('.doc: !(!(.name == "eve"))', DOC, False),
    ('(.doc: .n == 5 | !(*))', DOC, True),
    ('(.doc: .n == 6 | !(*))', DOC, False),
    ('doc: {(name|title): == "bob"; n: *}', DOC, True),
    ('doc: {(title|subtitle): == "bob"; n: *}', DOC, False),
    ('#main = .a: .b: @rest\n#rest = .c: .d: .e $= "af"', FIVE, True),
    ('#main = .a: .b: @rest\n#rest = .c: .d: .e $= "xx"', FIVE, False),
    ('doc: [name: *, (n: *)?]', DOC, True),
    ('doc: [(name: *)?, (title: *)?]', DOC, False),  # n never matched
    ('.rec: !(.author: [first: == "ada", last: == "wrong"])', MIXED, True),
]


# round 7: proto3 presence semantics, triple-encoded — a field that is
# genuinely ABSENT from the tree (pb: not emitted; JSON: no key; XML: no
# element) vs present.  This is the encoding-agnostic face of the pb
# corpus family (pb_optional_presence / pb_oneof_choice pin the
# Spark-row flavor, where null struct fields are present-childless).
NO_NAME = {"doc": {"n": 5}}
ONEOF_A = {"doc": {"a": 1, "id": 2}}
ONEOF_B = {"doc": {"b": 1, "id": 2}}
ONEOF_AB = {"doc": {"a": 1, "b": 2, "id": 3}}

CASES += [
    ('doc: {n: *; (name: *)?}', DOC, True),
    ('doc: {n: *; (name: *)?}', NO_NAME, True),    # absent -> optional ok
    ('doc: {n: *; name: *}', NO_NAME, False),      # absent -> required no
    ('doc: !({n: *; name: *})', NO_NAME, True),
    # oneof: exactly one of a/b set, id always present
    ('doc: ({a: *; id: *} | {b: *; id: *})', ONEOF_A, True),
    ('doc: ({a: *; id: *} | {b: *; id: *})', ONEOF_B, True),
    ('doc: ({a: *; id: *} | {b: *; id: *})', ONEOF_AB, False),
    # nested message whose submessage is absent entirely
    ('.doc: !(.meta: .author: .name == "eve")', NO_NAME, True),
    ('.doc: .meta: .author: .name == "eve"', NO_NAME, False),
]


def _verdicts(spec: str, tree: dict) -> dict:
    """Verdict per (encoding, engine) for one case."""
    g = compile_grammar(parse_grammar(spec))
    v = Validator(g)
    out = {}
    js = to_json(tree)
    out["json/derive"] = v.validate(decode_json(js))
    tv = try_table_validator(g)
    assert tv is not None, spec
    out["json/vpa"] = bool(tv.validate_batch([js])[0])
    out["xml/derive"] = v.validate(decode_xml(to_xml(tree)))
    desc, root, payload = to_protobuf(tree)
    out["pb/derive"] = v.validate(pb.decode_protobuf(desc, root, payload))
    return out


@pytest.mark.parametrize("spec,tree,want", CASES)
def test_one_grammar_three_encodings_one_verdict(spec, tree, want):
    got = _verdicts(spec, tree)
    assert set(got.values()) == {want}, (spec, got)


def test_encoders_produce_identical_forests():
    """Stronger than verdict equality: within the injective subset the
    three decoders must produce the very same forest."""
    for tree in (DOC, DEEP):
        jf = decode_json(to_json(tree))
        xf = decode_xml(to_xml(tree))
        desc, root, payload = to_protobuf(tree)
        pf = pb.decode_protobuf(desc, root, payload)
        assert jf == xf == pf, tree


def test_cross_encoding_spark_columns(spark):
    """The three Spark validation columns (automaton UDF / XML UDF /
    protobuf UDF) agree on triple-encoded rows — the distributed face of
    the suite."""
    from pyspark.sql import functions as F

    from katydid_haskell_spark.relapse.automaton import validate_json_column
    from katydid_haskell_spark.relapse.protobuf_source import (
        validate_protobuf_column,
    )
    from katydid_haskell_spark.relapse.xml_source import validate_xml_column

    trees = [
        DOC, DEEP,
        {"doc": {"name": "alice", "n": 99}},
        {"doc": {"name": "bob", "n": 4}},
        {"doc": {"meta": {"author": {"name": "zed"}}, "n": 17}},
    ]
    # one shared descriptor shape: all trees encode against their own
    # descriptor, so pick a spec family that works per-tree via rows
    spec = '.doc: (.name ^= "b" | .n >= 17)'
    g = compile_grammar(parse_grammar(spec))
    v = Validator(g)
    rows = []
    for i, t in enumerate(trees):
        desc, root, payload = to_protobuf(t)
        rows.append((i, to_json(t), to_xml(t), bytearray(payload)))
        # descriptor differs per tree only in nesting; the Spark pb column
        # needs ONE descriptor, so restrict pb rows to the DOC shape below
    df = spark.createDataFrame(
        rows, "id long, js string, xm string, pbb binary")
    out = df.select(
        "id",
        validate_json_column(F.col("js"), spec).alias("vj"),
        validate_xml_column(F.col("xm"), spec).alias("vx"),
    ).collect()
    want = {r[0]: v.validate(decode_json(r[1])) for r in rows}
    for r in out:
        assert r.vj == r.vx == want[r.id], r.id

    # protobuf column: rows sharing the DOC descriptor
    flat = [t for t in trees if set(t["doc"].keys()) == {"name", "n"}]
    desc, root, _ = to_protobuf(flat[0])
    prows = [(i, bytearray(to_protobuf(t)[2])) for i, t in enumerate(flat)]
    pdf = spark.createDataFrame(prows, "id long, pbb binary")
    pout = pdf.select(
        "id", validate_protobuf_column(F.col("pbb"), spec, desc, root)
        .alias("vp")).collect()
    pwant = {i: v.validate(decode_json(to_json(t)))
             for i, t in enumerate(flat)}
    for r in pout:
        assert r.vp == pwant[r.id], r.id
