"""File-based golden corpus: each case dir holds spec.relapse + rows.jsonl +
expected.json — the mechanism of the reference's language-agnostic suite
(/root/reference/test/Suite.hs:63-77,200-255), with the cross-algorithm
check (pure derivative vs Catalyst lowering) replacing its 4-algorithm run.
"""

import json
import os

import pytest
from pyspark.sql import types as T

from katydid_haskell_spark.relapse.derive import Validator
from katydid_haskell_spark.relapse.lower import compile_to_column
from katydid_haskell_spark.relapse.parser import parse_grammar
from katydid_haskell_spark.relapse.rows import row_to_forest
from katydid_haskell_spark.relapse.smart import compile_grammar

CORPUS = os.path.join(os.path.dirname(__file__), "corpus")
CASES = sorted(
    d for d in os.listdir(CORPUS)
    if os.path.exists(os.path.join(CORPUS, d, "spec.relapse"))
)

# cases whose array shapes (star/interleave INSIDE a concat, interleave
# over dynamic children) are beyond the static Catalyst lowering and run
# through the derivative-automaton UDF in production
AUTOMATON_ONLY = {
    # concat_star_middle lowers since round 3 (single-variable-segment
    # array concat: positional split, no backtracking needed)
    # interleave_array3 lowers since round 3 (≤4 one-node branches →
    # OR over permutations)
    # interleave_indexed6 / interleave_mixed5 / interleave_nested lower
    # since round 4 (name-feasibility matching enumeration: disjoint
    # constant index names prune the assignment space below the 24-term
    # cap regardless of branch count)
    # The final 10 nondeterministic array shapes lower since round 6 via
    # the compile-time Brzozowski DFA (lower.py _match_array_dfa,
    # array_regex.py): concat_backtrack, concat_star_star_long,
    # concat_of_interleaves, interleave_concat_mix, interleave_opt_star,
    # interleave_wild5 (407-state shuffle DFA), star_of_concat,
    # optional_chain, concat_opt_star_tail, star_of_optional — executed
    # as a codegen'd transform+aggregate fold over a literal transition
    # table.  Every FEASIBLE corpus shape is Catalyst-lowered; the
    # automaton/VPA engines remain exercised by the cross-check suites,
    # which force-run all engines on every case.
    #
    # interleave_seven_cap (round 8) pins the documented cap boundary
    # IN-CORPUS: 7 one-node shuffle branches exceed both the
    # _DFA_MAX_ATOMS=6 table cap and the 24-term matching enumeration,
    # so production dispatch demotes to the automaton UDF — by design,
    # with correct verdicts (test_atom_cap_automaton_parity's regime).
    "interleave_seven_cap",
}


def load_case(name):
    d = os.path.join(CORPUS, name)
    with open(os.path.join(d, "spec.relapse")) as f:
        spec = f.read().strip()
    with open(os.path.join(d, "rows.jsonl")) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    with open(os.path.join(d, "expected.json")) as f:
        expected = json.load(f)
    schema = T.StructType.fromDDL(expected["schema"])
    return spec, rows, schema, expected["verdicts"]


@pytest.mark.parametrize("name", CASES)
def test_corpus_python_engine(spark, name):
    # (spark fixture needed only for StructType.fromDDL's JVM dependency)
    spec, rows, schema, want = load_case(name)
    g = compile_grammar(parse_grammar(spec))
    v = Validator(g)
    got = [v.validate(row_to_forest(r, schema)) for r in rows]
    assert got == want, f"{name}: python engine got {got}, want {want}"


@pytest.mark.parametrize("name", CASES)
def test_corpus_unmemoized_derive(spark, name):
    """Fourth algorithm of the Suite.hs analogue: the UNMEMOIZED
    single-forest derivative (derive.py:derive, the Derive.hs readable
    version) must agree with the memoized Validator — together with the
    Catalyst and table-VPA checks this mirrors the reference's
    deriv/zip/mem/vpa four-way comparison (test/Suite.hs:46-61)."""
    from katydid_haskell_spark.relapse.derive import derive

    spec, rows, schema, want = load_case(name)
    g = compile_grammar(parse_grammar(spec))
    got = [derive(g, row_to_forest(r, schema)).nullable for r in rows]
    assert got == want, f"{name}: unmemoized derive got {got}, want {want}"


@pytest.mark.parametrize("name", CASES)
def test_corpus_catalyst(spark, name):
    """Spark-side verdicts must match the golden expectations through the
    PRODUCTION dispatch: Catalyst lowering where the shape is static,
    otherwise the derivative-automaton UDF (deep dynamic-children shapes
    — star/interleave inside array concat — are exactly its territory).
    Which engine ran is asserted visible via the lowered flag so a
    lowering regression can't silently demote cases to the UDF."""
    from pyspark.sql import functions as F

    from katydid_haskell_spark.relapse.automaton import validate_json_column
    from katydid_haskell_spark.relapse.lower import LoweringUnsupported

    spec, rows, schema, want = load_case(name)
    g = compile_grammar(parse_grammar(spec))
    df = spark.createDataFrame(
        [tuple(r.get(f.name) for f in schema.fields) for r in rows], schema
    )
    try:
        col = compile_to_column(g, schema)
        lowered = True
    except LoweringUnsupported:
        # production fallback: row → JSON → automaton UDF.  NULL fields
        # must be kept explicit ({"f": null}): the reference's Json.hs:40
        # makes a null-valued field a PRESENT node with no children, which
        # is what row_to_forest and decode_json both do — to_json's
        # default null-dropping would make the field absent instead.
        col = validate_json_column(
            F.to_json(F.struct(*[F.col(f.name) for f in schema.fields]),
                      {"ignoreNullFields": "false"}),
            spec)
        lowered = False
    got = [r["m"] for r in df.select(col.alias("m")).collect()]
    engine = "catalyst" if lowered else "automaton"
    assert got == want, f"{name}: {engine} got {got}, want {want}"
    # pin which cases are expected to lower: a shape that silently STOPS
    # lowering is a perf regression even when verdicts stay right
    assert lowered == (name not in AUTOMATON_ONLY), (
        f"{name}: lowered={lowered}, expected "
        f"{'automaton' if name in AUTOMATON_ONLY else 'catalyst'}")
