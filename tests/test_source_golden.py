"""Golden end-to-end cases for the XML and protobuf sources: the same
(spec, documents, expected) triple is checked through BOTH execution
paths — the pure derivative engine over the decoded forest, and the
Arrow-batched Spark column validator — the source-level analogue of the
row-corpus cross-check (reference: /root/reference/test/Suite.hs:46-61
runs every testsuite case through 4 algorithms)."""

import pytest
from pyspark.sql import functions as F

from katydid_haskell_spark.relapse import parse, validate
from katydid_haskell_spark.relapse.protobuf_source import (
    DescMap,
    Field,
    decode_protobuf,
    encode_field,
    encode_message_field,
    encode_packed_varints,
    encode_string,
    encode_varint,
    validate_protobuf_column,
)
from katydid_haskell_spark.relapse.xml_source import (
    decode_xml,
    validate_xml_column,
)

XML_CASES = [
    # (spec, [(doc, expected)])
    ("person: {name == \"ann\"; age == 34}",
     [("<person><name>ann</name><age>34</age></person>", True),
      ("<person><age>34</age><name>ann</name></person>", True),
      ("<person><name>bob</name><age>34</age></person>", False),
      ("<person><name>ann</name></person>", False)]),
    ("doc: .item: *",
     [("<doc><item>1</item><item>2</item></doc>", True),
      ("<doc><other>1</other></doc>", False),
      ("<doc/>", False)]),
    ("root: .b: -> ge($int, 5)",
     [("<root><a>1</a><b>7</b></root>", True),
      ("<root><b>4</b></root>", False),
      ("<root><b>x</b></root>", False)]),  # non-int text → eval error → False
    # --- mixed content (text interleaved with elements), round 8 ---
    # text runs become leaf nodes IN DOCUMENT ORDER; string leaves keep
    # the ORIGINAL text (tails included), so ' world' != 'world'
    ('p: [== "hello", b == 1, == " world"]',
     [("<p>hello<b>1</b> world</p>", True),
      ("<p>hello<b>1</b>world</p>", False),    # tail lost its space
      ("<p><b>1</b>hello world</p>", False),   # order: text-first required
      ("<p>hello<b>2</b> world</p>", False)]),
    # whitespace-only text produces NO node (reference parser parity);
    # non-whitespace tails do
    ('doc: [a == 1, == "x", a == 2]',
     [("<doc><a>1</a>x<a>2</a></doc>", True),
      ("<doc>\n  <a>1</a>x<a>2</a>\n</doc>", True),
      ("<doc><a>1</a><a>2</a></doc>", False)]),
    # integer-looking mixed text is an Int leaf (detection on the
    # STRIPPED text, Xml.hs text→Int rule), non-integer stays String
    ("q: [== 42, i == 0]",
     [("<q>42<i>0</i></q>", True),
      ("<q> 42 <i>0</i></q>", True),
      ("<q>fortytwo<i>0</i></q>", False)]),
]

DESC: DescMap = {
    "Doc": {
        1: Field("title", "string"),
        2: Field("tags", "string", repeated=True),
        3: Field("meta", "message", message="Meta"),
        4: Field("scores", "int64", repeated=True),
    },
    "Meta": {1: Field("lang", "string"), 2: Field("year", "int64")},
}


def _doc(title="t", tags=(), meta=None, packed_scores=None):
    out = encode_string(1, title)
    for t in tags:
        out += encode_string(2, t)
    if meta is not None:
        lang, year = meta
        out += encode_message_field(
            3, encode_string(1, lang) + encode_field(2, 0, encode_varint(year)))
    if packed_scores:
        out += encode_packed_varints(4, packed_scores)
    return out


PB_CASES = [
    ('.title == "hello"',
     [(_doc(title="hello"), True), (_doc(title="bye"), False)]),
    ('.meta: .lang *= []string{"en","de"}',
     [(_doc(meta=("en", 2024)), True),
      (_doc(meta=("fr", 2024)), False),
      (_doc(), False)]),
    ('.tags: .1 == "b"',
     [(_doc(tags=["a", "b"]), True), (_doc(tags=["a"]), False)]),
    ('.scores: .2 == 30',  # packed repeated → index-labeled children
     [(_doc(packed_scores=[10, 20, 30]), True),
      (_doc(packed_scores=[10, 20]), False)]),
]


@pytest.mark.parametrize("spec,docs", XML_CASES)
def test_xml_golden_both_paths(spark, spec, docs):
    g = parse(spec)
    pure = [validate(g, decode_xml(d)) for d, _ in docs]
    want = [e for _, e in docs]
    assert pure == want, f"pure engine: {pure} want {want}"
    df = spark.createDataFrame([(d,) for d, _ in docs], "doc string")
    col = [r["m"] for r in
           df.select(validate_xml_column(F.col("doc"), spec).alias("m")).collect()]
    assert col == want, f"column path: {col} want {want}"


@pytest.mark.parametrize("spec,docs", PB_CASES)
def test_protobuf_golden_both_paths(spark, spec, docs):
    g = parse(spec)
    pure = [validate(g, decode_protobuf(DESC, "Doc", d)) for d, _ in docs]
    want = [e for _, e in docs]
    assert pure == want, f"pure engine: {pure} want {want}"
    df = spark.createDataFrame([(bytearray(d),) for d, _ in docs],
                               "doc binary")
    col = [r["m"] for r in
           df.select(validate_protobuf_column(F.col("doc"), spec, DESC,
                                              "Doc").alias("m")).collect()]
    assert col == want, f"column path: {col} want {want}"


def test_protobuf_column_null_and_garbage(spark):
    df = spark.createDataFrame(
        [(bytearray(_doc(title="hello")),), (None,), (bytearray(b"\xff\xff"),)],
        "doc binary")
    got = [r["m"] for r in df.select(
        validate_protobuf_column(F.col("doc"), '.title == "hello"', DESC,
                                 "Doc").alias("m")).collect()]
    assert got == [True, False, False]
