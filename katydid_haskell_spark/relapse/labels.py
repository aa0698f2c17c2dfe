"""Labels and labeled trees — the data model Relapse validates.

Mirrors the reference's data abstractions (behavior only, not code):
``Label`` is a tagged union of 6 scalar types and ``Tree`` is an ordered
labeled rose tree (``/root/reference/src/Data/Katydid/Parser/Parser.hs:22-37``).
A *document* is a forest ``[Tree]`` because e.g. valid JSON ``[1,2]`` has no
single root (``Relapse.hs:10-14``).

JSON encoding (``/root/reference/src/Data/Katydid/Parser/Json.hs:39-58``):
  - object field  → node labeled ``String key``, value forest as children
  - array element → node labeled ``Int index``, value forest as children
  - number        → ``Int`` if integral else ``Double``
  - ``null``      → *no node at all* (empty forest)
"""

from __future__ import annotations

import json
import math
from typing import Any, NamedTuple

# Label type tags (the 6 scalar types of the reference).
BOOL = "bool"
INT = "int"
UINT = "uint"
DOUBLE = "double"
STRING = "string"
BYTES = "bytes"

SCALAR_TYPES = (BOOL, INT, UINT, DOUBLE, STRING, BYTES)

# List types (used only by expressions, never as labels).
LIST_TYPES = {t: "[]" + t for t in SCALAR_TYPES}


class Label(NamedTuple):
    """A typed label: ``(ty, value)`` with ``ty`` one of the 6 scalar tags."""

    ty: str
    value: Any

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"{self.ty}({self.value!r})"


class TreeNode(NamedTuple):
    """An ordered labeled rose tree node."""

    label: Label
    children: tuple  # tuple[TreeNode, ...]

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if not self.children:
            return repr(self.label)
        return f"{self.label!r}->{list(self.children)!r}"


def node(label: Label, children: tuple = ()) -> TreeNode:
    return TreeNode(label, tuple(children))


def string_label(v: str) -> Label:
    return Label(STRING, v)


def int_label(v: int) -> Label:
    return Label(INT, v)


def json_value_to_forest(v: Any) -> tuple:
    """JSON value → forest, matching the reference's JSON encoding exactly."""
    if v is None:
        return ()
    if isinstance(v, bool):
        return (node(Label(BOOL, v)),)
    if isinstance(v, int):
        return (node(Label(INT, v)),)
    if isinstance(v, float):
        # integral floats decode as Int (JSRational with denominator 1)
        if math.isfinite(v) and float(v).is_integer():
            return (node(Label(INT, int(v))),)
        return (node(Label(DOUBLE, v)),)
    if isinstance(v, str):
        return (node(Label(STRING, v)),)
    if isinstance(v, list):
        return tuple(
            node(Label(INT, i), json_value_to_forest(e)) for i, e in enumerate(v)
        )
    if isinstance(v, dict):
        return tuple(
            node(Label(STRING, k), json_value_to_forest(val)) for k, val in v.items()
        )
    raise TypeError(f"cannot encode {type(v)} as a labeled tree")


try:  # gated: orjson (Rust) parses ~7x faster than stdlib when present
    import orjson as _orjson
except ImportError:  # pragma: no cover - depends on environment
    _orjson = None


def _loads(s):
    """Fast JSON parse with exact stdlib semantics.

    orjson rejects out-of-range numbers (>64-bit integers, overflowing
    floats like 1e400) that stdlib — and the reference's arbitrary-
    precision Aeson JSRational — accepts; retry those through stdlib so
    only genuinely malformed documents raise.  The double parse is paid
    only on orjson-rejected inputs.
    """
    if _orjson is not None:
        try:
            return _orjson.loads(s)
        except Exception:
            pass
    return json.loads(s)


def decode_json(s: str) -> tuple:
    """Parse a JSON document string into a forest of labeled trees."""
    return json_value_to_forest(_loads(s))
