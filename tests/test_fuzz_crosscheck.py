"""Seeded fuzz cross-check: many randomly composed specs evaluated by the
Catalyst lowering (one job, one column per spec) must agree with the pure
derivative engine on randomly generated rows (including nulls and
type-edge values).  Deterministic (seed=7)."""

import random

import pytest
from pyspark.sql import types as T

from katydid_haskell_spark.relapse.derive import Validator
from katydid_haskell_spark.relapse.lower import compile_to_column
from katydid_haskell_spark.relapse.parser import parse_grammar
from katydid_haskell_spark.relapse.rows import row_to_forest
from katydid_haskell_spark.relapse.smart import compile_grammar

SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("flag", T.BooleanType()),
])

rng = random.Random(7)

STRINGS = ["", "en", "de", "https://a.b/c", "http://x", "data spark", "UPPER"]
INTS = [-5, 0, 1, 42, 1000]
DOUBLES = [-1.5, 0.0, 0.5, 3.14]


def rand_row():
    def maybe(v):
        return None if rng.random() < 0.25 else v

    return {
        "url": maybe(rng.choice(STRINGS)),
        "lang": maybe(rng.choice(STRINGS)),
        "n": maybe(rng.choice(INTS)),
        "score": maybe(rng.choice(DOUBLES)),
        "flag": maybe(rng.choice([True, False])),
    }


def leaf_spec():
    kind = rng.randrange(8)
    if kind == 0:
        return f'.lang == "{rng.choice(STRINGS[:4])}"'
    if kind == 1:
        return f".n: {rng.choice(['>=', '<', '==', '!='])} {rng.choice(INTS)}"
    if kind == 2:
        return f'.url ^= "{rng.choice(["http", "https://", "x"])}"'
    if kind == 3:
        return f'.url *= "{rng.choice(["a.b", "x", "spark"])}"'
    if kind == 4:
        return f'.score: -> gt($double, double({rng.choice([0.0, 1.0])}))'
    if kind == 5:
        return f'.flag == {rng.choice(["true", "false"])}'
    if kind == 6:
        return f'.lang *= []string{{"en","de"}}'
    return f'.url ~= "{rng.choice(["^https?://", "[a-z]+", "b/c$"])}"'


def rand_spec(depth=2):
    if depth == 0 or rng.random() < 0.4:
        return leaf_spec()
    op = rng.choice(["|", "&"])
    a, b = rand_spec(depth - 1), rand_spec(depth - 1)
    s = f"({a} {op} {b})"
    if rng.random() < 0.3:
        s = f"!({s})"
    return s


N_SPECS = 60
N_ROWS = 25


def test_fuzz_catalyst_vs_derivative(spark):
    specs = [rand_spec() for _ in range(N_SPECS)]
    rows = [rand_row() for _ in range(N_ROWS)]
    grammars = [compile_grammar(parse_grammar(s)) for s in specs]
    cols = [compile_to_column(g, SCHEMA).alias(f"c{i}")
            for i, g in enumerate(grammars)]
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in SCHEMA.fields) for r in rows], SCHEMA
    )
    got = df.select(*cols).collect()
    for i, g in enumerate(grammars):
        v = Validator(g)
        want = [v.validate(row_to_forest(r, SCHEMA)) for r in rows]
        have = [row[f"c{i}"] for row in got]
        assert have == want, (
            f"spec #{i} {specs[i]!r}: catalyst={have} derivative={want}"
        )
