"""Completeness tests for the remaining stdlib functions (elem, toLower,
toUpper, and/or const-folds, uint literals) and the HLL sketch rollup."""

import pytest
from pyspark.sql import functions as F

from katydid_haskell_spark.operators.stats import (
    hll_bucket_sketches,
    hll_merge_estimate,
)
from katydid_haskell_spark.relapse import parse, validate
from katydid_haskell_spark.relapse.exprs import (
    BOOL,
    INT,
    STRING,
    Const,
    Func,
    RelapseError,
    Var,
)
from katydid_haskell_spark.relapse.labels import decode_json
from katydid_haskell_spark.relapse.parser import parse_grammar


def main_expr(spec):
    g = parse_grammar(spec)
    node = g["main"]
    return node


def test_elem_const_folds():
    # elem over a constant list folds at parse time (trim* analogue)
    g = main_expr('-> eq($int, elem([]int{10,20,30}, 1))')
    assert g.expr == Func("eq", BOOL, (Var(INT), Const(INT, 20)))


def test_tolower_toupper():
    g = parse('a: -> eq(toLower($string), "hi")')
    assert validate(g, decode_json('{"a":"HI"}'))
    assert validate(g, decode_json('{"a":"hi"}'))
    assert not validate(g, decode_json('{"a":"no"}'))
    g2 = parse('a: -> eq(toUpper($string), toUpper("hi"))')
    assert validate(g2, decode_json('{"a":"Hi"}'))


def test_and_or_folding():
    # and with const false folds the whole node predicate to emptySet
    g = main_expr("-> and(eq($int, 1), false)")
    assert g.expr == Const(BOOL, False)
    g2 = main_expr("-> or(eq($int, 1), true)")
    assert g2.expr == Const(BOOL, True)
    # contradiction detection: eq(x,1) and eq(x,2) → false (Logic.hs:80-86)
    g3 = main_expr("-> and(eq($int, 1), eq($int, 2))")
    assert g3.expr == Const(BOOL, False)
    # idempotence
    g4 = main_expr("-> and(eq($int, 1), eq($int, 1))")
    assert g4.expr == Func("eq", BOOL, (Var(INT), Const(INT, 1)))


def test_uint_semantics():
    # uint literals only match Uint labels (strict, like the reference);
    # JSON never produces Uint, so == uint(5) never matches JSON data
    g = parse("a == uint(5)")
    assert not validate(g, decode_json('{"a":5}'))


def test_length_string_bytes():
    g = parse("a: -> eq(length($string), 3)")
    assert validate(g, decode_json('{"a":"abc"}'))
    assert not validate(g, decode_json('{"a":"ab"}'))


def test_parse_errors_are_clean():
    for bad in ["a ==", "-> unknownFn($int)", "#x = ", "(a:* &", "[]int{1,"]:
        with pytest.raises(RelapseError):
            parse(bad)


def test_hll_sketch_rollup(spark):
    df = spark.createDataFrame(
        [(i % 4, f"u{i % 137}") for i in range(1000)], "bucket int, url string"
    )
    sketches = hll_bucket_sketches(df, "url")
    assert sketches.count() == 4
    est = hll_merge_estimate(sketches).collect()[0]
    assert est["rows"] == 1000
    assert abs(est["distinct_estimate"] - 137) <= 5  # HLL error bound
