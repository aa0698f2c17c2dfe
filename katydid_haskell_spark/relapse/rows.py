"""Row ↔ labeled-forest encoding for DataFrame records.

The exact counterpart of the encoding :mod:`.lower` unrolls against: one
node per schema field labeled with the field name, NULL → childless node,
scalars → one leaf child, structs → field-node children, arrays →
index-labeled element nodes (mirrors ``Json.hs:39-58`` plus the Spark type
mapping of ``lower.label_type_of``).  Used by tests to cross-check the
Catalyst path against the pure derivative engine, and by the automaton path
for whole-row dynamic validation.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import types as T

from .labels import BOOL, BYTES, DOUBLE, INT, STRING, Label, TreeNode, node
from .lower import label_type_of


def _scalar_label(value: Any, dt: T.DataType, ty: str) -> Label:
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        if isinstance(value, _dt.datetime):
            epoch = _dt.datetime(1970, 1, 1, tzinfo=value.tzinfo)
            value = int((value - epoch).total_seconds())
        return Label(INT, int(value))
    if isinstance(dt, T.DateType):
        return Label(STRING, value.isoformat() if isinstance(value, _dt.date) else str(value))
    if ty == DOUBLE:
        return Label(DOUBLE, float(value))
    if ty == INT:
        return Label(INT, int(value))
    if ty == BOOL:
        return Label(BOOL, bool(value))
    if ty == BYTES:
        return Label(BYTES, bytes(value))
    return Label(STRING, str(value))


def value_to_forest(value: Any, dt: T.DataType) -> tuple:
    if value is None:
        return ()
    ty = label_type_of(dt)
    if ty is not None:
        return (node(_scalar_label(value, dt, ty)),)
    if isinstance(dt, T.StructType):
        if hasattr(value, "asDict"):
            value = value.asDict()
        return tuple(
            node(Label(STRING, f.name), value_to_forest(value.get(f.name), f.dataType))
            for f in dt.fields
        )
    if isinstance(dt, T.ArrayType):
        return tuple(
            node(Label(INT, i), value_to_forest(v, dt.elementType))
            for i, v in enumerate(value)
        )
    raise TypeError(f"unsupported Spark type {dt}")


def row_to_forest(row: Any, schema: T.StructType) -> tuple:
    """A Row/dict as the forest the lowering derives over."""
    if hasattr(row, "asDict"):
        row = row.asDict()
    return tuple(
        node(Label(STRING, f.name), value_to_forest(row.get(f.name), f.dataType))
        for f in schema.fields
    )
