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
