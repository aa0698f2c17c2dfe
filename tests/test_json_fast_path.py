"""from_json fast path: agreement with the automaton UDF + fallback rules."""

import pytest
from pyspark.sql import functions as F

from katydid_haskell_spark.relapse.automaton import (
    try_lower_json_spec,
    validate_json_column,
)

DOCS = [
    '{"k": 87}',
    '{"k": 10}',
    '{"k": 50}',
    '{"j": 87}',            # field absent
    '{"k": "x"}',           # wrong type → error-as-false
    '{"k": null}',          # null → absent value node
    "{}",
    "not json",
    None,
    '{"k": 87, "extra": 1}',  # unknown fields ignored by field anchoring
    '{"k": 87.0}',            # integral float → Int label (Json.hs:42-44)
    '{"k": 1e10}',            # integral exponent → Int label
    '{"k": 1.5}',             # non-integral → Double label
    '{"k": "87"}',            # string never coerces to number
    '{"k": true}',
    '{"name": "ann", "k": 87}',
    "[1,2]",                  # top-level array: no field nodes
]

FAST_SPECS = [
    '.k >= 50',
    '(.k >= 50 & .k < 90)',
    '!(.k == 87)',
    '(.k == 87 | .name == "ann")',
    '.name ^= "a"',
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([(d,) for d in DOCS], "doc string").cache()


@pytest.mark.parametrize("spec", FAST_SPECS)
def test_fast_matches_udf(spark, df, spec):
    fast = try_lower_json_spec(F.col("doc"), spec)
    assert fast is not None, f"{spec} should qualify for the fast path"
    got = df.select(
        fast.alias("fast"),
        validate_json_column(F.col("doc"), spec, fast=False).alias("udf"),
    ).collect()
    for doc, row in zip(DOCS, got):
        assert row["fast"] == row["udf"], (
            f"spec={spec} doc={doc!r}: fast={row['fast']} udf={row['udf']}"
        )


@pytest.mark.parametrize(
    "spec",
    [
        "k: >= 50",           # bare node: exactly-one-field semantics
        ".k: *",              # nullable child (matches absent-value nodes)
        ".items: (_: >= 1)*",  # nested/dynamic shape
        "*",                  # no fields at all
    ],
)
def test_non_qualifying_falls_back(spark, spec):
    assert try_lower_json_spec(F.col("doc"), spec) is None


NESTED_DOCS = [
    '{"a": {"b": 1}}',
    '{"a": {"b": 2}}',
    '{"a": {"b": 1, "c": 9}}',
    '{"a": {"x": {"b": 1}}}',     # too deep: b not a direct child
    '{"a": [{"b": 1}]}',          # array step: index-labeled children
    '{"a": "b"}',                 # scalar: leaf child, not a field node
    '{"a": null}',                # childless a node
    '{"a": {"b": null}}',         # childless b node
    '{"a": {"b": {"c": 1}}}',     # b is an object, not an int leaf
    '{"b": 1}',                   # missing intermediate
    '{}', None, "not json",
    '{"a": {"b": 1.0}}',          # integral float → Int label
    '{"a": {"b": "1"}}',          # string never coerces
    '{"a": {"b": true}}',
]

NESTED_SPECS = [
    '.a: .b == 1',
    '(.a: .b >= 1 & .a: .b < 5)',
    '!(.a: .b == 1)',
    '.a: .b: .c == 1',
    '(.a: .b == 1 | .b == 1)',
]


@pytest.mark.parametrize("spec", NESTED_SPECS)
def test_nested_path_fast_matches_udf(spark, spec):
    """Round 4: Contains chains lower to one variant path ($.a.b) — must
    agree with the automaton on every intermediate-step shape (arrays,
    scalars, nulls, depth mismatches)."""
    df = spark.createDataFrame([(d,) for d in NESTED_DOCS], "doc string")
    fast = try_lower_json_spec(F.col("doc"), spec)
    assert fast is not None, f"{spec} should qualify for the fast path"
    got = df.select(
        fast.alias("fast"),
        validate_json_column(F.col("doc"), spec, fast=False).alias("udf"),
    ).collect()
    for doc, row in zip(NESTED_DOCS, got):
        assert row["fast"] == row["udf"], (
            f"spec={spec} doc={doc!r}: fast={row['fast']} udf={row['udf']}"
        )
