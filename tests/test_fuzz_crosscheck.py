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
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("meta", T.StructType([
        T.StructField("author", T.StringType()),
        T.StructField("year", T.LongType()),
    ])),
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
        "tags": maybe([rng.choice(["t1", "t2", "x", ""])
                       for _ in range(rng.randrange(0, 4))]),
        "meta": maybe({"author": maybe(rng.choice(STRINGS)),
                       "year": maybe(rng.choice(INTS))}),
    }


def mixed_pred():
    # Sub-predicates of deliberately mixed variable types: on any given field
    # at most one of these evaluates without a type error, so composing them
    # under or/and/not exercises the applicative error-propagation semantics
    # (Logic.hs: error on either side -> error -> node root False).
    return rng.choice([
        "eq($int, 5)",
        "ge($int, 0)",
        'hasPrefix($string, "h")',
        'contains($string, "a")',
        "gt($double, double(0.0))",
        "eq($bool, true)",
        'eq(toLower($string), "en")',
    ])


def pred_comp(depth=2):
    if depth == 0 or rng.random() < 0.35:
        return mixed_pred()
    op = rng.choice(["or", "and", "or", "not"])
    if op == "not":
        return f"not({pred_comp(depth - 1)})"
    return f"{op}({pred_comp(depth - 1)}, {pred_comp(depth - 1)})"


def leaf_spec():
    kind = rng.randrange(15)
    if kind == 12:
        # constant-index Contains (two-arg filter-lambda lowering)
        return f'.tags: .{rng.randrange(0, 4)} == "{rng.choice(["t1", "x"])}"'
    if kind == 13:
        # anyname-except / name-choice over array indices
        name = rng.choice(["!(0)", "(0|2)", "!(1)", "(1|3)"])
        return f'.tags: .{name} == "{rng.choice(["t2", "", "x"])}"'
    if kind == 14:
        # star of an index-named node (only [] or length-1-at-index match)
        return f'.tags: ({rng.randrange(0, 2)}: == "t1")*'
    if kind == 9:
        return f'.tags: (_: ^= "{rng.choice(["t", "x"])}")*'
    if kind == 10:
        return f'.tags: ._ == "{rng.choice(["t1", "x", ""])}"'
    if kind == 11:
        sub = rng.choice([
            'author ^= "d"', "year: >= 0", 'author == "en"', "year == 42",
        ])
        return f".meta: .{sub}"
    if kind == 8:
        field = rng.choice(["url", "lang", "n", "score", "flag"])
        return f".{field}: -> {pred_comp()}"
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


N_SPECS = 80
N_ROWS = 25


def test_fuzz_catalyst_vs_derivative(spark):
    specs = [rand_spec() for _ in range(N_SPECS)]
    rows = [rand_row() for _ in range(N_ROWS)]
    grammars = [compile_grammar(parse_grammar(s)) for s in specs]
    cols = [compile_to_column(g, SCHEMA).alias(f"c{i}")
            for i, g in enumerate(grammars)]
    def spark_row(r):
        vals = []
        for f in SCHEMA.fields:
            v = r[f.name]
            if f.name == "meta" and v is not None:
                v = (v["author"], v["year"])
            vals.append(v)
        return tuple(vals)

    df = spark.createDataFrame([spark_row(r) for r in rows], SCHEMA)
    got = df.select(*cols).collect()
    for i, g in enumerate(grammars):
        v = Validator(g)
        want = [v.validate(row_to_forest(r, SCHEMA)) for r in rows]
        have = [row[f"c{i}"] for row in got]
        assert have == want, (
            f"spec #{i} {specs[i]!r}: catalyst={have} derivative={want}"
        )


# ---------------------------------------------------------------------------
# dynamic-array shape fuzz: star/optional/interleave INSIDE concat are
# beyond the static Catalyst lowering and run through the derivative-
# automaton UDF in production — fuzz that path against the pure engine
# (the golden corpus pins 8 such shapes; this adds breadth)
# ---------------------------------------------------------------------------

drng = random.Random(11)


def _dyn_elem():
    if drng.random() < 0.3:
        return f'_: ^= "{drng.choice(["t", "x"])}"'
    return f'_: == "{drng.choice(["t1", "t2", "x", ""])}"'


def _dyn_item():
    e = _dyn_elem()
    return drng.choice([e, f"({e})*", f"({e})?", "*"])


def dyn_spec():
    k = drng.randrange(5)
    if k == 0:
        items = ", ".join(_dyn_item() for _ in range(drng.randrange(2, 4)))
        return f".tags: [{items}]"
    if k == 1:
        branches = "; ".join(
            drng.choice([_dyn_elem(), f"({_dyn_elem()})*",
                         f"({_dyn_elem()})?"])
            for _ in range(drng.randrange(2, 4)))
        return f".tags: {{{branches}}}"
    if k == 2:
        return f".tags: ([{_dyn_elem()}, {_dyn_elem()}])*"
    if k == 3:
        return f".tags: !(({_dyn_elem()})*)"
    return f"(.tags: [{_dyn_item()}, {_dyn_item()}] & .tags: (_: *)*)"


def test_fuzz_automaton_vs_derivative_dynamic_shapes(spark):
    import json as _json

    from pyspark.sql import functions as F

    from katydid_haskell_spark.relapse.automaton import validate_json_column

    tags_schema = T.StructType(
        [T.StructField("tags", T.ArrayType(T.StringType()))])
    specs = [dyn_spec() for _ in range(40)]
    rows = []
    for _ in range(25):
        if drng.random() < 0.1:
            rows.append({"tags": None})
        else:
            rows.append({"tags": [drng.choice(["t1", "t2", "x", ""])
                                  for _ in range(drng.randrange(0, 5))]})
    from katydid_haskell_spark.relapse.lower import LoweringUnsupported

    df = spark.createDataFrame(
        [(r["tags"],) for r in rows], tags_schema).coalesce(1)
    doc = F.to_json(F.struct(F.col("tags")),
                    {"ignoreNullFields": "false"})
    cols = [validate_json_column(doc, s).alias(f"c{i}")
            for i, s in enumerate(specs)]
    # three-way where possible: single-variable-segment concats lower
    # since round 3 — fuzz the new lowering alongside the automaton
    lowered_idx = []
    for i, s in enumerate(specs):
        try:
            cols.append(compile_to_column(
                compile_grammar(parse_grammar(s)), tags_schema)
                .alias(f"l{i}"))
            lowered_idx.append(i)
        except LoweringUnsupported:
            pass
    got = df.select(*cols).collect()
    n_lowered = len(lowered_idx)
    assert n_lowered > 0, "fuzz produced no lowerable dynamic spec"
    for i, s in enumerate(specs):
        v = Validator(compile_grammar(parse_grammar(s)))
        want = [v.validate(row_to_forest(r, tags_schema)) for r in rows]
        have = [row[f"c{i}"] for row in got]
        assert have == want, (
            f"dyn spec #{i} {s!r}: automaton={have} derivative={want}")
        if i in lowered_idx:
            lhave = [row[f"l{i}"] for row in got]
            assert lhave == want, (
                f"dyn spec #{i} {s!r}: catalyst={lhave} derivative={want}")
