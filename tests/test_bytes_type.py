"""Bytes label type through both execution paths: []byte literals, ordering
(unsigned lexicographic — Compare.hs:98-99 parity), length via octet_length."""

import pytest
from pyspark.sql import types as T

from katydid_haskell_spark.relapse.derive import Validator
from katydid_haskell_spark.relapse.lower import compile_to_column
from katydid_haskell_spark.relapse.parser import parse_grammar
from katydid_haskell_spark.relapse.rows import row_to_forest
from katydid_haskell_spark.relapse.smart import compile_grammar

SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("blob", T.BinaryType()),
])

ROWS = [
    {"name": "a", "blob": b"abc"},
    {"name": "b", "blob": b"ab"},
    {"name": "c", "blob": bytes([0x00, 0xFF])},  # high byte: unsigned order
    {"name": "d", "blob": bytes([0x00, 0x01])},
    {"name": "e", "blob": b""},
    {"name": "f", "blob": None},
]

SPECS = [
    ".blob == []byte{'a','b','c'}",
    ".blob != []byte{'a','b'}",
    ".blob: >= []byte{0, 128}",            # unsigned comparison boundary
    ".blob: -> eq(length($[]byte), 2)",
    ".blob :: $[]byte",
    "(.blob == []byte{0, 255} | .blob == []byte{0, 1})",
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(r["name"], r["blob"]) for r in ROWS], SCHEMA
    ).cache()


@pytest.mark.parametrize("spec", SPECS)
def test_bytes_crosscheck(spark, df, spec):
    g = compile_grammar(parse_grammar(spec))
    v = Validator(g)
    want = [v.validate(row_to_forest(r, SCHEMA)) for r in ROWS]
    col = compile_to_column(g, SCHEMA)
    got = [r["m"] for r in df.select(col.alias("m")).collect()]
    assert got == want, f"spec={spec}: catalyst={got} derivative={want}"


def test_unsigned_byte_ordering(spark, df):
    # 0x00FF > 0x0001 must hold in BOTH paths (unsigned lexicographic)
    spec = ".blob: > []byte{0, 1}"
    g = compile_grammar(parse_grammar(spec))
    v = Validator(g)
    py = {r["name"]: v.validate(row_to_forest(r, SCHEMA)) for r in ROWS}
    assert py["c"] is True   # 0x00FF > 0x0001
    assert py["d"] is False
    col = compile_to_column(g, SCHEMA)
    sql = {r["name"]: r["m"] for r in
           df.select("name", col.alias("m")).collect()}
    assert sql == py
