"""Protobuf source parity tests (wire decode → forest → validate)."""

import pytest

from katydid_haskell_spark.relapse import parse, validate
from katydid_haskell_spark.relapse.labels import (
    BOOL,
    DOUBLE,
    INT,
    STRING,
    UINT,
    Label,
    node,
)
from katydid_haskell_spark.relapse.protobuf_source import (
    DescMap,
    Field,
    ProtoError,
    decode_protobuf,
    encode_double,
    encode_field,
    encode_int64,
    encode_message_field,
    encode_string,
    encode_varint,
)

DESC: DescMap = {
    "Person": {
        1: Field("name", "string"),
        2: Field("age", "int64"),
        3: Field("emails", "string", repeated=True),
        4: Field("addr", "message", message="Address"),
        5: Field("score", "double"),
        6: Field("active", "bool"),
    },
    "Address": {1: Field("street", "string"), 2: Field("zip", "uint64")},
}


def person_bytes():
    addr = encode_string(1, "main st") + encode_field(
        2, 0, encode_varint(12345)
    )
    return (
        encode_string(1, "ann")
        + encode_int64(2, 34)
        + encode_string(3, "a@x.com")
        + encode_string(3, "b@x.com")
        + encode_message_field(4, addr)
        + encode_double(5, 0.5)
        + encode_field(6, 0, encode_varint(1))
    )


def test_decode_shapes():
    f = decode_protobuf(DESC, "Person", person_bytes())
    assert f == (
        node(Label(STRING, "name"), (node(Label(STRING, "ann")),)),
        node(Label(STRING, "age"), (node(Label(INT, 34)),)),
        node(Label(STRING, "emails"), (
            node(Label(INT, 0), (node(Label(STRING, "a@x.com")),)),
            node(Label(INT, 1), (node(Label(STRING, "b@x.com")),)),
        )),
        node(Label(STRING, "addr"), (
            node(Label(STRING, "street"), (node(Label(STRING, "main st")),)),
            node(Label(STRING, "zip"), (node(Label(UINT, 12345)),)),
        )),
        node(Label(STRING, "score"), (node(Label(DOUBLE, 0.5)),)),
        node(Label(STRING, "active"), (node(Label(BOOL, True)),)),
    )


def test_validate_protobuf_forest():
    f = decode_protobuf(DESC, "Person", person_bytes())
    g = parse('(.name == "ann" & .age: >= 18 & .addr: .zip == uint(12345))')
    assert validate(g, f)
    g2 = parse('.emails: ._: $= "@x.com"')  # some email ends with @x.com
    assert validate(g2, f)
    g3 = parse('.age: >= 40')
    assert not validate(g3, f)


def test_unknown_fields_skipped():
    data = person_bytes() + encode_string(99, "ignored")
    f = decode_protobuf(DESC, "Person", data)
    assert len(f) == 6  # unknown field produced no node


def test_negative_int_and_zigzag():
    desc = {"M": {1: Field("a", "int64"), 2: Field("b", "sint64")}}
    data = encode_int64(1, -5 & ((1 << 64) - 1)) + encode_field(
        2, 0, encode_varint((5 << 1) ^ 0 | 1)  # zigzag(-3) = 5... see below
    )
    # zigzag encode -3 → 5
    data = encode_int64(1, -5) + encode_field(2, 0, encode_varint(5))
    f = decode_protobuf(desc, "M", data)
    assert f[0] == node(Label(STRING, "a"), (node(Label(INT, -5)),))
    assert f[1] == node(Label(STRING, "b"), (node(Label(INT, -3)),))


def test_truncated_errors():
    with pytest.raises(ProtoError):
        decode_protobuf(DESC, "Person", person_bytes()[:-3])
    with pytest.raises(ProtoError):
        decode_protobuf(DESC, "Nope", b"")


def test_packed_repeated_scalars_match_unpacked():
    """Packed encoding (proto3 default) must produce the same tree as the
    unpacked encoding of the same values — beyond the reference, which
    TODOs packed decoding at Protobuf.hs:280."""
    from katydid_haskell_spark.relapse.protobuf_source import (
        encode_packed_fixed64,
        encode_packed_varints,
    )

    desc: DescMap = {
        "M": {
            1: Field("xs", "int64", repeated=True),
            2: Field("ds", "double", repeated=True),
            3: Field("ss", "sint32", repeated=True),
        }
    }
    packed = (
        encode_packed_varints(1, [3, 270, 86942])
        + encode_packed_fixed64(2, [0.5, -1.25])
        + encode_packed_varints(3, [1, 2])  # zigzag-encoded -1, 1
    )
    unpacked = (
        encode_field(1, 0, encode_varint(3))
        + encode_field(1, 0, encode_varint(270))
        + encode_field(1, 0, encode_varint(86942))
        + encode_double(2, 0.5)
        + encode_double(2, -1.25)
        + encode_field(3, 0, encode_varint(1))
        + encode_field(3, 0, encode_varint(2))
    )
    fp = decode_protobuf(desc, "M", packed)
    fu = decode_protobuf(desc, "M", unpacked)
    assert fp == fu
    assert fp == (
        node(Label(STRING, "xs"), (
            node(Label(INT, 0), (node(Label(INT, 3)),)),
            node(Label(INT, 1), (node(Label(INT, 270)),)),
            node(Label(INT, 2), (node(Label(INT, 86942)),)),
        )),
        node(Label(STRING, "ds"), (
            node(Label(INT, 0), (node(Label(DOUBLE, 0.5)),)),
            node(Label(INT, 1), (node(Label(DOUBLE, -1.25)),)),
        )),
        node(Label(STRING, "ss"), (
            node(Label(INT, 0), (node(Label(INT, -1)),)),
            node(Label(INT, 1), (node(Label(INT, 1)),)),
        )),
    )
    # and the forest validates through the Relapse engine
    g = parse('.xs: .1 == 270')
    assert validate(g, fp)


def test_packed_mixed_with_unpacked_runs():
    """Proto3 parsers must accept packed and unpacked occurrences mixed on
    the same field; adjacent-run grouping (reference semantics) applies."""
    from katydid_haskell_spark.relapse.protobuf_source import (
        encode_packed_varints,
    )

    desc: DescMap = {"M": {1: Field("xs", "int64", repeated=True)}}
    data = (
        encode_field(1, 0, encode_varint(7))
        + encode_packed_varints(1, [8, 9])
    )
    f = decode_protobuf(desc, "M", data)
    # one adjacent run of three values → one group, indexes 0..2
    assert f == (
        node(Label(STRING, "xs"), (
            node(Label(INT, 0), (node(Label(INT, 7)),)),
            node(Label(INT, 1), (node(Label(INT, 8)),)),
            node(Label(INT, 2), (node(Label(INT, 9)),)),
        )),
    )


def test_packed_truncated_fixed_run_is_error():
    desc: DescMap = {"M": {2: Field("ds", "double", repeated=True)}}
    bad = encode_field(2, 2, encode_varint(7) + b"\x00" * 7)
    with pytest.raises(ProtoError):
        decode_protobuf(desc, "M", bad)


def test_packed_on_nonrepeated_scalar_is_error():
    desc: DescMap = {"M": {1: Field("x", "int64")}}
    from katydid_haskell_spark.relapse.protobuf_source import (
        encode_packed_varints,
    )
    with pytest.raises(ProtoError):
        decode_protobuf(desc, "M", encode_packed_varints(1, [1, 2]))


def test_repeated_message_groups_validate():
    """Repeated MESSAGE fields (the reference pb suite's repeated-group
    family, test/Suite.hs pb cases): wire occurrences decode to ONE
    name node with Int-indexed children in wire order — the same array
    normal form the JSON decoder produces, which is what keeps one
    grammar encoding-agnostic — including a repeated scalar INSIDE the
    repeated message."""
    desc: DescMap = {
        "Doc": {1: Field("entry", "message", repeated=True,
                         message="Entry")},
        "Entry": {1: Field("k", "string"),
                  2: Field("vs", "int64", repeated=True)},
    }
    payload = (
        encode_message_field(1, encode_string(1, "a")
                             + encode_int64(2, 1) + encode_int64(2, 2))
        + encode_message_field(1, encode_string(1, "b"))
    )
    f = decode_protobuf(desc, "Doc", payload)
    g = parse('entry: (_: {k: -> type($string); (vs: (_: >= 0)*)?})*')
    assert validate(g, f)
    # order: ordered concat over the repeated group's indexed elements
    assert validate(parse('entry: [_: .k == "a", _: .k == "b"]'), f)
    assert not validate(parse('entry: [_: .k == "b", _: .k == "a"]'), f)
    # a negative value deep inside the third occurrence flips the verdict
    bad = payload + encode_message_field(
        1, encode_string(1, "c") + encode_int64(2, -5))
    assert not validate(g, decode_protobuf(desc, "Doc", bad))
