"""Protobuf wire-format → labeled forest (descriptor-driven).

Behavioral parity with the reference's decoder
(``/root/reference/src/Data/Katydid/Parser/Protobuf/Protobuf.hs:165-293``):

- field → node labeled ``String fieldName`` with the value forest as
  children; nested messages recurse;
- **consecutive** occurrences of a repeated field group into one node
  whose children are ``Int index``-labeled (Protobuf.hs:171-183 — note the
  reference only groups adjacent runs; we mirror that);
- unknown fields are skipped, not errors (Protobuf.hs:203-207);
- scalar mapping: int32/64 → Int, uint/fixed → Uint, sint → zigzag Int,
  bool → Bool, enum → Uint, float/double → Double, string → String
  (strict utf-8), bytes → Bytes;
- packed repeated scalars ARE decoded (proto3 packs by default) — this
  deliberately surpasses the reference, which TODOs them at
  Protobuf.hs:280; the resulting tree shape is identical to the unpacked
  encoding of the same values;
- ``group`` wire type unsupported.

No protobuf library needed: the wire format (varint / fixed32 / fixed64 /
length-delimited) is decoded directly.  The descriptor is a plain dict
model instead of a compiled FileDescriptorSet:

    desc = {
        "Person": {
            1: Field("name", "string"),
            2: Field("age", "int64"),
            3: Field("emails", "string", repeated=True),
            4: Field("addr", "message", message="Address"),
        },
        "Address": {1: Field("street", "string")},
    }
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import pandas as pd

from .labels import BOOL, BYTES, DOUBLE, INT, STRING, UINT, Label, TreeNode, node


class ProtoError(Exception):
    pass


@dataclass(frozen=True)
class Field:
    name: str
    type: str  # int32 int64 uint32 uint64 sint32 sint64 bool enum
    #            fixed32 sfixed32 float fixed64 sfixed64 double
    #            string bytes message
    repeated: bool = False
    message: Optional[str] = None


MessageDesc = Dict[int, Field]
DescMap = Dict[str, MessageDesc]

_VARINT, _FIXED64, _LENGTHY, _SGROUP, _EGROUP, _FIXED32 = 0, 1, 2, 3, 4, 5


def _read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ProtoError("truncated varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not (b & 0x80):
            return out & ((1 << 64) - 1), pos
        shift += 7
        if shift > 63:
            raise ProtoError("varint too long")


def _zigzag(v: int, bits: int) -> int:
    v &= (1 << bits) - 1
    return (v >> 1) ^ -(v & 1)


def _signed(v: int, bits: int) -> int:
    v &= (1 << bits) - 1
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


_VARINT_TYPES = ("int32", "int64", "uint32", "uint64", "sint32", "sint64",
                 "bool", "enum")
_FIXED32_TYPES = ("float", "fixed32", "sfixed32")
_FIXED64_TYPES = ("double", "fixed64", "sfixed64")


def _fixed32_label(ftype: str, raw: bytes) -> Label:
    if ftype == "float":
        return Label(DOUBLE, struct.unpack("<f", raw)[0])
    if ftype == "fixed32":
        return Label(UINT, struct.unpack("<I", raw)[0])
    if ftype == "sfixed32":
        return Label(INT, struct.unpack("<i", raw)[0])
    raise ProtoError(f"{ftype} cannot use fixed32 wire")


def _fixed64_label(ftype: str, raw: bytes) -> Label:
    if ftype == "double":
        return Label(DOUBLE, struct.unpack("<d", raw)[0])
    if ftype == "fixed64":
        return Label(UINT, struct.unpack("<Q", raw)[0])
    if ftype == "sfixed64":
        return Label(INT, struct.unpack("<q", raw)[0])
    raise ProtoError(f"{ftype} cannot use fixed64 wire")


def _decode_packed(field: Field, raw: bytes) -> list:
    """Packed repeated scalars (proto3 packs by default).

    The reference punts on these (Protobuf.hs:280 TODO); we decode them —
    any real proto3 corpus hits packed encoding immediately.  Each value
    becomes one occurrence, so adjacent-run grouping in decode_message
    produces the same index-labeled tree shape as the unpacked encoding.
    """
    vals = []
    if field.type in _VARINT_TYPES:
        pos = 0
        while pos < len(raw):
            v, pos = _read_varint(raw, pos)
            vals.append((node(_varint_label(field.type, v)),))
    elif field.type in _FIXED32_TYPES:
        if len(raw) % 4:
            raise ProtoError("packed fixed32 run not a multiple of 4 bytes")
        for i in range(0, len(raw), 4):
            vals.append((node(_fixed32_label(field.type, raw[i:i + 4])),))
    elif field.type in _FIXED64_TYPES:
        if len(raw) % 8:
            raise ProtoError("packed fixed64 run not a multiple of 8 bytes")
        for i in range(0, len(raw), 8):
            vals.append((node(_fixed64_label(field.type, raw[i:i + 8])),))
    else:
        raise ProtoError(f"{field.type} is not packable")
    return vals


def _varint_label(ftype: str, v: int) -> Label:
    if ftype in ("int64", "int32"):
        return Label(INT, _signed(v, 64))
    if ftype in ("uint64", "uint32"):
        return Label(UINT, v)
    if ftype == "enum":
        return Label(UINT, v)
    if ftype == "bool":
        return Label(BOOL, v != 0)
    if ftype == "sint32":
        return Label(INT, _zigzag(v, 32))
    if ftype == "sint64":
        return Label(INT, _zigzag(v, 64))
    raise ProtoError(f"field type {ftype} cannot use varint wire")


def _decode_fields(desc: DescMap, msg: MessageDesc, data: bytes) -> list:
    """→ list of (field_number, children_forest) in wire order."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        tag, pos = _read_varint(data, pos)
        wire = tag & 7
        number = tag >> 3
        field = msg.get(number)
        if field is None:  # skip unknown field
            if wire == _VARINT:
                _, pos = _read_varint(data, pos)
            elif wire == _FIXED64:
                pos += 8
            elif wire == _FIXED32:
                pos += 4
            elif wire == _LENGTHY:
                ln, pos = _read_varint(data, pos)
                pos += ln
            else:
                raise ProtoError(f"unsupported wire type {wire}")
            if pos > n:
                raise ProtoError("truncated field")
            continue
        if wire == _VARINT:
            v, pos = _read_varint(data, pos)
            children = (node(_varint_label(field.type, v)),)
        elif wire == _FIXED32:
            if pos + 4 > n:
                raise ProtoError("truncated fixed32")
            raw = data[pos : pos + 4]
            pos += 4
            children = (node(_fixed32_label(field.type, raw)),)
        elif wire == _FIXED64:
            if pos + 8 > n:
                raise ProtoError("truncated fixed64")
            raw = data[pos : pos + 8]
            pos += 8
            children = (node(_fixed64_label(field.type, raw)),)
        elif wire == _LENGTHY:
            ln, pos = _read_varint(data, pos)
            if pos + ln > n:
                raise ProtoError("truncated length-delimited field")
            raw = data[pos : pos + ln]
            pos += ln
            if field.type == "bytes":
                children = (node(Label(BYTES, raw)),)
            elif field.type == "string":
                try:
                    children = (node(Label(STRING, raw.decode("utf-8"))),)
                except UnicodeDecodeError as e:
                    raise ProtoError(str(e)) from None
            elif field.type == "message":
                sub = desc.get(field.message or "")
                if sub is None:
                    raise ProtoError(f"unknown message type: {field.message}")
                children = decode_message(desc, field.message, raw)
            elif field.repeated and field.type in (
                _VARINT_TYPES + _FIXED32_TYPES + _FIXED64_TYPES
            ):
                # packed repeated scalars: one occurrence per packed value
                # (beyond the reference, which TODOs this — Protobuf.hs:280)
                for ch in _decode_packed(field, raw):
                    out.append((number, field, ch))
                continue
            else:
                raise ProtoError(
                    f"{field.type} cannot use length-delimited wire"
                )
        else:
            raise ProtoError(f"unsupported wire type {wire}")
        out.append((number, field, children))
    return out


def decode_message(desc: DescMap, msg_name: str, data: bytes) -> tuple:
    """Decode one message's bytes into its field-node forest."""
    msg = desc.get(msg_name)
    if msg is None:
        raise ProtoError(f"unknown message type: {msg_name}")
    fields = _decode_fields(desc, msg, data)
    # merge CONSECUTIVE runs of a repeated field into index-labeled groups
    out = []
    i = 0
    while i < len(fields):
        number, field, children = fields[i]
        if field.repeated:
            run = [children]
            j = i + 1
            while j < len(fields) and fields[j][0] == number:
                run.append(fields[j][2])
                j += 1
            indexed = tuple(
                node(Label(INT, idx), ch) for idx, ch in enumerate(run)
            )
            out.append(node(Label(STRING, field.name), indexed))
            i = j
        else:
            out.append(node(Label(STRING, field.name), children))
            i += 1
    return tuple(out)


def decode_protobuf(desc: DescMap, msg_name: str, data: bytes) -> tuple:
    """Protobuf message bytes → forest (the reference's ``decode``)."""
    return decode_message(desc, msg_name, data)


# -- Spark column path -------------------------------------------------------


def validate_protobuf_column(col, spec_source: str, desc: DescMap,
                             msg_name: str):
    """Boolean Column: protobuf-encoded binary column matches the Relapse
    spec (decode → forest → memoized derivative validator, Arrow-batched;
    same contract as xml_source.validate_xml_column — undecodable or null
    payloads are False, never errors)."""
    from pyspark.sql.functions import pandas_udf

    from .derive import Validator
    from .parser import parse_grammar
    from .smart import compile_grammar

    compile_grammar(parse_grammar(spec_source))  # fail fast on driver

    @pandas_udf("boolean")
    def match(payloads: pd.Series) -> pd.Series:
        v = Validator(compile_grammar(parse_grammar(spec_source)))

        def one(raw):
            if raw is None:
                return False
            try:
                forest = decode_protobuf(desc, msg_name, bytes(raw))
            except ProtoError:
                return False
            return v.validate(forest)

        from .automaton import factorized_map
        return factorized_map(payloads, one)

    return match(col)


# -- tiny encoder (tests / fixtures only) -----------------------------------


def encode_varint(v: int) -> bytes:
    v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_field(number: int, wire: int, payload: bytes) -> bytes:
    return encode_varint((number << 3) | wire) + payload


def encode_string(number: int, s: str) -> bytes:
    raw = s.encode("utf-8")
    return encode_field(number, _LENGTHY, encode_varint(len(raw)) + raw)


def encode_int64(number: int, v: int) -> bytes:
    return encode_field(number, _VARINT, encode_varint(v))


def encode_message_field(number: int, payload: bytes) -> bytes:
    return encode_field(number, _LENGTHY, encode_varint(len(payload)) + payload)


def encode_double(number: int, v: float) -> bytes:
    return encode_field(number, _FIXED64, struct.pack("<d", v))


def encode_packed_varints(number: int, vals) -> bytes:
    payload = b"".join(encode_varint(v) for v in vals)
    return encode_field(number, _LENGTHY, encode_varint(len(payload)) + payload)


def encode_packed_fixed64(number: int, vals, fmt: str = "<d") -> bytes:
    payload = b"".join(struct.pack(fmt, v) for v in vals)
    return encode_field(number, _LENGTHY, encode_varint(len(payload)) + payload)
