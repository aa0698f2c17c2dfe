"""Extended-regex DFA over array elements, via Brzozowski derivatives.

Array-content patterns that the positional templates in :mod:`.lower`
cannot express — two star segments (nondeterministic split), interleaves
with variable-length branches, star of a multi-element group, chains of
optionals — are still REGULAR languages over element nodes.  This module
compiles such a pattern to a DFA at lowering time so it can execute
JVM-side with zero Python in the hot path:

    syms  = F.transform(arr, (e, i) -> bitvector of atom predicates)
    state = F.aggregate(syms, lit(0), (s, v) -> element_at(table, ...))
    match = state IN accepting

The alphabet is the truth vector of the k distinct element-atom
predicates (2**k symbols, k capped); DFA states are canonical extended
regexes (alt / and / not / cat / star / shuffle) interned modulo
associativity-commutativity-idempotence; the transition table is one flat
int-array literal.  This is the same derivative algorithm the reference
executes at runtime (Derive.hs:121-138) run to fixpoint at COMPILE time
over the element alphabet — the per-row work is a codegen'd fold.

Shuffle (katydid Interleave over sibling element nodes) derives by the
standard rule D(p # q) = D(p) # q  |  p # D(q), nullable(p # q) =
nullable(p) and nullable(q); shuffle children form a MULTISET (p # p is
not p), so canonicalization sorts but never dedups them.

Regexes are plain nested tuples so interning is dict-by-value:
    ("eps",) ("null",) ("any",) ("atom", i)
    ("cat", a, b) ("star", a) ("not", a)
    ("alt", *sorted) ("and", *sorted) ("shuf", *sorted)
"""

from __future__ import annotations

from typing import Dict, List, Tuple

Rx = tuple

EPS: Rx = ("eps",)
NULL: Rx = ("null",)
ANY: Rx = ("any",)  # exactly one element, any label/content
TOP: Rx = ("not", NULL)  # universal language (complement of empty set)


class DfaTooBig(Exception):
    """Atom or state cap exceeded — caller falls back to the automaton."""


def _key(r: Rx) -> str:
    return repr(r)


def cat(a: Rx, b: Rx) -> Rx:
    if a == NULL or b == NULL:
        return NULL
    if a == EPS:
        return b
    if b == EPS:
        return a
    if a[0] == "cat":  # right-associate for canonical form
        return cat(a[1], cat(a[2], b))
    return ("cat", a, b)


def alt(*rs: Rx) -> Rx:
    flat: List[Rx] = []
    for r in rs:
        if r[0] == "alt":
            flat.extend(r[1:])
        elif r != NULL:
            flat.append(r)
    uniq = sorted(set(flat), key=_key)
    if not uniq:
        return NULL
    if TOP in uniq:
        return TOP
    if len(uniq) == 1:
        return uniq[0]
    return ("alt", *uniq)


def rand(*rs: Rx) -> Rx:
    flat: List[Rx] = []
    for r in rs:
        if r[0] == "and":
            flat.extend(r[1:])
        elif r == TOP:
            continue
        elif r == NULL:
            return NULL
        else:
            flat.append(r)
    uniq = sorted(set(flat), key=_key)
    if not uniq:
        return TOP
    if len(uniq) == 1:
        return uniq[0]
    return ("and", *uniq)


def rnot(r: Rx) -> Rx:
    if r[0] == "not":
        return r[1]
    return ("not", r)


def star(r: Rx) -> Rx:
    if r[0] == "star":
        return r
    if r == EPS or r == NULL:
        return EPS
    if r[0] == "alt" and EPS in r[1:]:  # (p?)* == p*
        return star(alt(*[c for c in r[1:] if c != EPS]))
    return ("star", r)


def shuf(*rs: Rx) -> Rx:
    flat: List[Rx] = []
    for r in rs:
        if r[0] == "shuf":
            flat.extend(r[1:])
        elif r == NULL:
            return NULL
        elif r == EPS:
            continue
        else:
            flat.append(r)
    if not flat:
        return EPS
    if len(flat) == 1:
        return flat[0]
    return ("shuf", *sorted(flat, key=_key))  # multiset: sort, never dedup


def nullable(r: Rx, memo: Dict[Rx, bool] = None) -> bool:
    if memo is None:
        memo = {}
    got = memo.get(r)
    if got is not None:
        return got
    k = r[0]
    if k == "eps" or k == "star":
        v = True
    elif k in ("null", "atom", "any"):
        v = False
    elif k == "cat":
        v = nullable(r[1], memo) and nullable(r[2], memo)
    elif k == "alt":
        v = any(nullable(c, memo) for c in r[1:])
    elif k in ("and", "shuf"):
        v = all(nullable(c, memo) for c in r[1:])
    elif k == "not":
        v = not nullable(r[1], memo)
    else:  # pragma: no cover
        raise AssertionError(k)
    memo[r] = v
    return v


def deriv(r: Rx, tv: Tuple[bool, ...], memo: Dict[Rx, Rx]) -> Rx:
    """Brzozowski derivative of ``r`` w.r.t. an element whose atom truth
    vector is ``tv``.  ``memo`` is per-truth-vector."""
    got = memo.get(r)
    if got is not None:
        return got
    k = r[0]
    if k in ("eps", "null"):
        d = NULL
    elif k == "any":
        d = EPS
    elif k == "atom":
        d = EPS if tv[r[1]] else NULL
    elif k == "cat":
        a, b = r[1], r[2]
        d = cat(deriv(a, tv, memo), b)
        if nullable(a):
            d = alt(d, deriv(b, tv, memo))
    elif k == "alt":
        d = alt(*[deriv(c, tv, memo) for c in r[1:]])
    elif k == "and":
        d = rand(*[deriv(c, tv, memo) for c in r[1:]])
    elif k == "not":
        d = rnot(deriv(r[1], tv, memo))
    elif k == "star":
        d = cat(deriv(r[1], tv, memo), r)
    elif k == "shuf":
        cs = r[1:]
        d = alt(*[
            shuf(deriv(c, tv, memo), *cs[:i], *cs[i + 1:])
            for i, c in enumerate(cs)
        ])
    else:  # pragma: no cover
        raise AssertionError(k)
    memo[r] = d
    return d


def build_dfa(r: Rx, n_atoms: int,
              max_states: int) -> Tuple[List[int], List[int], int]:
    """Explore the derivative graph to fixpoint.

    Returns ``(flat_table, accepting_states, n_symbols)`` where
    ``flat_table[s * n_symbols + v]`` is the next state from state ``s``
    on symbol ``v`` (the atom truth bitvector), state 0 is the start, and
    ``accepting_states`` are the nullable ones.  Raises :class:`DfaTooBig`
    past ``max_states``.
    """
    n_sym = 1 << n_atoms
    tvs = [tuple(bool(v >> b & 1) for b in range(n_atoms))
           for v in range(n_sym)]
    states: Dict[Rx, int] = {r: 0}
    order: List[Rx] = [r]
    table: List[int] = []
    i = 0
    while i < len(order):
        cur = order[i]
        for tv in tvs:
            d = deriv(cur, tv, {})
            j = states.get(d)
            if j is None:
                if len(order) >= max_states:
                    raise DfaTooBig(
                        f"array DFA exceeds {max_states} states")
                j = len(order)
                states[d] = j
                order.append(d)
            table.append(j)
        i += 1
    nmemo: Dict[Rx, bool] = {}
    accepting = [idx for idx, s in enumerate(order) if nullable(s, nmemo)]
    return table, accepting, n_sym
