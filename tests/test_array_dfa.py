"""The round-6 array-DFA lowering: nondeterministic array-content shapes
(two star segments, variable-length interleave branches, star of a group,
optional chains) compile to a Brzozowski DFA at lowering time
(lower.py `_match_array_dfa`, array_regex.py) and execute as a codegen'd
transform+aggregate fold — no automaton demotion.

Checks here:
  1. pure DFA-builder unit semantics (concat-of-stars, shuffle MULTISET
     discipline, (p?)* collapse, not/and);
  2. Spark parity vs the pure derivative engine over edge-case arrays
     (null array, empty array, null elements, long arrays, index names);
  3. the caps still demote: >6 distinct atoms raises LoweringUnsupported
     (the automaton path stays correct via validate_json_column).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from katydid_haskell_spark.relapse import array_regex as RX
from katydid_haskell_spark.relapse.automaton import validate_json_column
from katydid_haskell_spark.relapse.derive import Validator
from katydid_haskell_spark.relapse.lower import (
    LoweringUnsupported,
    compile_to_column,
)
from katydid_haskell_spark.relapse.parser import parse_grammar
from katydid_haskell_spark.relapse.rows import row_to_forest
from katydid_haskell_spark.relapse.smart import compile_grammar


# ---------------------------------------------------------------------------
# 1. DFA builder unit semantics
# ---------------------------------------------------------------------------

A, B = ("atom", 0), ("atom", 1)
SYM_A, SYM_B, SYM_NONE, SYM_AB = 1, 2, 0, 3


def run_dfa(r, n_atoms, seq):
    table, acc, n_sym = RX.build_dfa(r, n_atoms, 4096)
    s = 0
    for v in seq:
        s = table[s * n_sym + v]
    return s in acc


def test_concat_of_stars():
    r = RX.cat(RX.star(A), RX.star(B))
    assert run_dfa(r, 2, [])
    assert run_dfa(r, 2, [SYM_A, SYM_A, SYM_B])
    assert run_dfa(r, 2, [SYM_B, SYM_B])
    assert not run_dfa(r, 2, [SYM_B, SYM_A])
    assert not run_dfa(r, 2, [SYM_A, SYM_NONE])


def test_shuffle_is_a_multiset():
    # p # p requires exactly TWO elements matching p — sort-not-dedup
    r = RX.shuf(A, A)
    assert run_dfa(r, 1, [1, 1])
    assert not run_dfa(r, 1, [1])
    assert not run_dfa(r, 1, [1, 1, 1])


def test_shuffle_with_any_and_overlap():
    r = RX.shuf(A, B, RX.ANY)
    assert run_dfa(r, 2, [SYM_A, SYM_B, SYM_NONE])
    assert run_dfa(r, 2, [SYM_NONE, SYM_B, SYM_A])
    # an element matching BOTH atoms can serve either branch
    assert run_dfa(r, 2, [SYM_AB, SYM_B, SYM_A])
    assert not run_dfa(r, 2, [SYM_A, SYM_B])


def test_star_of_optional_collapses():
    assert RX.star(RX.alt(RX.EPS, A)) == RX.star(A)


def test_not_and():
    # "no a anywhere" AND "all b"
    contains_a = RX.cat(RX.star(RX.ANY), RX.cat(A, RX.star(RX.ANY)))
    r = RX.rand(RX.rnot(contains_a), RX.star(B))
    assert run_dfa(r, 2, [SYM_B, SYM_B])
    assert run_dfa(r, 2, [])
    assert not run_dfa(r, 2, [SYM_B, SYM_A])
    assert not run_dfa(r, 2, [SYM_NONE])


def test_dfa_too_big():
    r = RX.shuf(*[("atom", i) for i in range(5)])
    with pytest.raises(RX.DfaTooBig):
        RX.build_dfa(r, 5, 16)


# ---------------------------------------------------------------------------
# 2. Spark parity vs the pure derivative engine
# ---------------------------------------------------------------------------

SCHEMA = T.StructType([
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("nums", T.ArrayType(T.LongType())),
])

ROWS = [
    {"tags": t, "nums": n}
    for t, n in [
        (None, None),
        ([], []),
        (["a"], [1]),
        (["a", "a", "a"], [1, 2, 3]),
        (["a", "b"], [3, -1]),
        (["b", "a"], [-1, 3]),
        (["a", "b", "c"], [0, 0, 0]),
        (["c", "b", "a"], [5, -5]),
        (["a", "a", "b", "b"], [1, -1, 1]),
        (["a", None, "b"], [None, 2]),
        ([None], [None]),
        (["x"], [7, 8, 9, -1, -2]),
        (["a", "b", "a", "b"], [2, 4, 6]),
        (["b"], [-9]),
        (["a", "c"], [1, 1, 1, 1, 1, 1, 1]),
    ]
]

# every spec here needs the DFA fallback (refused by the positional
# templates), except where noted
DFA_SPECS = [
    '.tags: [(_:== "a")*, _:== "a", (_:== "a")*]',       # two stars
    '.tags: ([_:== "a", _:== "b"])*',                    # star of group
    '.tags: [(_:== "a")?, (_:== "b")?, (_:== "c")?]',    # optional chain
    '.tags: [(_:== "a")?, (_:== "b")*, _:== "c"]',       # opt + star + node
    '.tags: ((_:== "a")?)*',                             # (p?)*
    '.tags: {(_:== "a")*; (_:== "b")?}',                 # var-len interleave
    '.tags: {_:== "a"; _:== "a"}',                       # multiset shuffle
    '.tags: {[_:== "a", _:== "b"]; _:== "c"}',           # concat in shuffle
    '.tags: [{_:== "a"; _:== "b"}, {_:== "c"; _:== "d"}]',
    '.tags: !([(_:== "a")*, (_:== "b")*])',              # complement
    '.tags: ([(_: *)*, _:== "b"] & [(_:== "a")*, (_:== "b")*])',
    '.nums: [(_: > 0)*, (_: < 0)*]',                     # ints, two stars
    '.nums: [(0: > 0)?, (_: > 1)*]',                     # index-dep name
    '.tags: [(_: *)*, _:== "b", (_: *)*]',               # contains via stars
]


def _python_verdicts(spec):
    g = compile_grammar(parse_grammar(spec))
    v = Validator(g)
    return [v.validate(row_to_forest(r, SCHEMA)) for r in ROWS]


@pytest.fixture(scope="module")
def adf(spark):
    return spark.createDataFrame(
        [(r["tags"], r["nums"]) for r in ROWS], SCHEMA).cache()


@pytest.mark.parametrize("spec", DFA_SPECS)
def test_dfa_lowering_matches_derivative(spark, adf, spec):
    want = _python_verdicts(spec)
    g = compile_grammar(parse_grammar(spec))
    col = compile_to_column(g, SCHEMA)  # must NOT raise: DFA path covers it
    got = [r["m"] for r in adf.select(col.alias("m")).collect()]
    assert got == want, f"spec={spec}\nwant={want}\ngot={got}"


# ---------------------------------------------------------------------------
# 3. caps demote to the automaton, which stays correct
# ---------------------------------------------------------------------------

SEVEN_ATOMS = ('.tags: [' + ', '.join(
    f'(_:== "{c}")*' for c in 'abcdefg') + ']')


def test_atom_cap_demotes():
    g = compile_grammar(parse_grammar(SEVEN_ATOMS))
    with pytest.raises(LoweringUnsupported):
        compile_to_column(g, SCHEMA)


def test_atom_cap_automaton_parity(spark):
    docs = ['{"tags":["a","b","g"]}', '{"tags":["g","a"]}',
            '{"tags":[]}', '{"tags":["a","a","c","f"]}']
    g = compile_grammar(parse_grammar(SEVEN_ATOMS))
    v = Validator(g)
    from katydid_haskell_spark.relapse.labels import decode_json
    want = [v.validate(decode_json(d)) for d in docs]
    sdf = spark.createDataFrame([(d,) for d in docs], "doc string")
    got = [r["m"] for r in sdf.select(
        validate_json_column(F.col("doc"), SEVEN_ATOMS).alias("m")
    ).collect()]
    assert got == want
