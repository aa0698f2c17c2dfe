"""VpaUnsupported retirement soak (VERDICT r5 'Next round' #8).

Constructs TableValidators for thousands of randomly composed grammars —
random pattern ASTs (the hypothesis generator's shape space, sampled far
past its per-run example budget), recursive references, and >63-condition
wide grammars — and batch-validates a seeded shape-diverse doc corpus
through each.  Counts every construction failure and every batch-path
exception.  Zero occurrences over >=5k cases is the evidence bar for
deleting the vestigial ``VpaUnsupported`` class (the catch-path safety
net) from vpa.py / automaton.py.

Run: ``python scripts/vpa_soak.py [n_cases] [seed]`` — prints one JSON
line.  Deterministic for a given (n_cases, seed).
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from katydid_haskell_spark.relapse import ast  # noqa: E402
from katydid_haskell_spark.relapse.derive import Validator  # noqa: E402
from katydid_haskell_spark.relapse.exprs import (  # noqa: E402
    BOOL,
    DOUBLE,
    INT,
    STRING,
    Const,
    Var,
    mk_expr,
)
from katydid_haskell_spark.relapse.labels import decode_json  # noqa: E402
from katydid_haskell_spark.relapse.parser import parse_grammar  # noqa: E402
from katydid_haskell_spark.relapse.smart import compile_grammar  # noqa: E402
from katydid_haskell_spark.relapse.vpa import TableValidator  # noqa: E402

PREDS = [
    Const(BOOL, True),
    Const(BOOL, False),
    mk_expr("eq", [Var(STRING), Const(STRING, "a")]),
    mk_expr("ne", [Var(STRING), Const(STRING, "b")]),
    mk_expr("hasPrefix", [Var(STRING), Const(STRING, "a")]),
    mk_expr("hasSuffix", [Var(STRING), Const(STRING, "b")]),
    mk_expr("contains", [Var(STRING), Const(STRING, "x")]),
    mk_expr("eq", [Var(INT), Const(INT, 1)]),
    mk_expr("gt", [Var(INT), Const(INT, 0)]),
    mk_expr("le", [Var(INT), Const(INT, 2)]),
    mk_expr("gt", [Var(DOUBLE), Const(DOUBLE, 0.5)]),
    mk_expr("type", [Var(INT)]),
    mk_expr("type", [Var(STRING)]),
    mk_expr("not", [mk_expr("eq", [Var(STRING), Const(STRING, "a")])]),
    mk_expr("or", [mk_expr("eq", [Var(STRING), Const(STRING, "a")]),
                   mk_expr("eq", [Var(INT), Const(INT, 2)])]),
    mk_expr("and", [mk_expr("ge", [Var(INT), Const(INT, 0)]),
                    mk_expr("lt", [Var(INT), Const(INT, 5)])]),
]


def rand_pattern(rng: random.Random, depth: int):
    if depth == 0 or rng.random() < 0.25:
        return rng.choice([
            ast.Empty(), ast.ZAny(),
            ast.Node(rng.choice(PREDS), ast.Empty()),
        ])
    sub = lambda: rand_pattern(rng, depth - 1)  # noqa: E731
    k = rng.randrange(9)
    if k == 0:
        return ast.Node(rng.choice(PREDS), sub())
    if k == 1:
        return ast.Or(sub(), sub())
    if k == 2:
        return ast.And(sub(), sub())
    if k == 3:
        return ast.Not(sub())
    if k == 4:
        return ast.Concat(sub(), sub())
    if k == 5:
        return ast.Interleave(sub(), sub())
    if k == 6:
        return ast.ZeroOrMore(sub())
    if k == 7:
        return ast.Optional(sub())
    return ast.Contains(sub())


def gen_doc(rng: random.Random, depth: int = 3):
    r = rng.random()
    if depth == 0 or r < 0.3:
        return rng.choice([None, True, False, 0, 1, 2, -1, "a", "b", "ab",
                           "x", "", 1.5, 0.5])
    if r < 0.68:
        ks = rng.sample(["a", "b", "x", "k", "m"], rng.randrange(1, 4))
        return {k: gen_doc(rng, depth - 1) for k in ks}
    return [gen_doc(rng, depth - 1) for _ in range(rng.randrange(0, 4))]


def wide_spec(rng: random.Random) -> str:
    n = rng.randrange(70, 140)
    return "#main = (" + " | ".join(
        f".f{i} == {rng.randrange(50)}" for i in range(n)) + ")"


def recursive_spec(rng: random.Random) -> str:
    leaf = rng.choice(['.v == 1', '.v ^= "a"', '.v: >= 0'])
    return f"#main = (@rec | {leaf})\n#rec = .child: @main"


def main() -> None:
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 99
    rng = random.Random(seed)
    docs = [json.dumps(gen_doc(rng)) for _ in range(40)] + [
        "{}", "[]", "null", "1", '"a"', '["a","b"]', '{"a":null}',
        None, "not json", '{"a": {"b": {"x": [1, "a", null]}}}',
    ]
    stats = {"cases": 0, "vpa_unsupported": 0, "construct_errors": 0,
             "batch_errors": 0, "divergences": 0, "verified": 0}
    errors = []
    for i in range(n_cases):
        kind = i % 20
        try:
            if kind == 18:
                g = compile_grammar(parse_grammar(wide_spec(rng)))
            elif kind == 19:
                g = compile_grammar(parse_grammar(recursive_spec(rng)))
            else:
                g = compile_grammar({"main": rand_pattern(rng, 3)})
        except Exception:
            continue  # generator produced an invalid grammar: not a VPA case
        stats["cases"] += 1
        try:
            tv = TableValidator(g)
        except Exception as exc:  # noqa: BLE001 — the soak's entire point
            key = "vpa_unsupported" if type(exc).__name__ == "VpaUnsupported" \
                else "construct_errors"
            stats[key] += 1
            errors.append((i, "construct", repr(exc)[:200]))
            continue
        try:
            got = list(tv.validate_batch(docs))
        except Exception as exc:  # noqa: BLE001
            key = "vpa_unsupported" if type(exc).__name__ == "VpaUnsupported" \
                else "batch_errors"
            stats[key] += 1
            errors.append((i, "batch", repr(exc)[:200]))
            continue
        # every 40th case: full engine cross-check (keeps the soak honest
        # without making it a second fuzz suite)
        if i % 40 == 0:
            v = Validator(g)
            want = []
            for d in docs:
                if d is None:
                    want.append(False)
                    continue
                try:
                    want.append(v.validate(decode_json(d)))
                except Exception:
                    want.append(False)
            if got != want:
                stats["divergences"] += 1
                errors.append((i, "diverge", ""))
            else:
                stats["verified"] += 1
    stats["seed"] = seed
    stats["errors_sample"] = errors[:10]
    print(json.dumps(stats))
    if stats["vpa_unsupported"] or stats["construct_errors"] \
            or stats["batch_errors"] or stats["divergences"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
