"""Smart (compiled) patterns: hash-consed, canonicalized, simplified.

Re-creates the behavior of ``/root/reference/src/Data/Katydid/Relapse/Smart.hs``:

- compile verifies the ``main`` ref exists and rejects recursive grammars
  (Smart.hs:43-55);
- every pattern is rebuilt through smart constructors that cache nullability,
  canonicalize (n-ary sorted/deduped Or/And/Interleave) and algebraically
  simplify: ZAny/emptySet absorption, double negation, concat
  re-association, ``ZAny·p·ZAny → Contains p``, merging of leaf nodes and of
  nodes with equal name expressions (Smart.hs:187-384);
- ``unescapable`` short-circuit (Smart.hs:396-399).

Interning: patterns are interned in a per-process table, so identity
comparison (`is`) and `id()`-keyed memo tables are sound and O(1) — the
analogue of the reference's cached ``_hash`` + efficient ``cmp``
(Smart.hs:144-169).
"""

from __future__ import annotations

import itertools
from typing import Dict, Iterable, Optional, Tuple

from . import ast
from .exprs import Expr, RelapseError, and_expr, const_bool_value, or_expr

# Pattern kinds
EMPTY = "empty"
ZANY = "zany"
NODE = "node"
OR = "or"
AND = "and"
NOT = "not"
CONCAT = "concat"
INTERLEAVE = "interleave"
ZERO_OR_MORE = "star"
OPTIONAL = "opt"
CONTAINS = "contains"
REF = "ref"

_counter = itertools.count()


class SPattern:
    """An interned, canonical pattern node. Compare with ``is``."""

    __slots__ = ("kind", "expr", "pats", "ref", "nullable", "pid")

    def __init__(self, kind, expr, pats, ref, nullable):
        self.kind = kind
        self.expr = expr
        self.pats = pats  # tuple[SPattern, ...]
        self.ref = ref
        self.nullable = nullable
        self.pid = next(_counter)

    def __repr__(self) -> str:
        return to_str(self)

    # interned: default identity hash/eq are exactly what we want.


_INTERN: Dict[tuple, SPattern] = {}


def _mk(kind, expr=None, pats: Tuple[SPattern, ...] = (), ref: Optional[str] = None,
        nullable: bool = False) -> SPattern:
    key = (kind, expr, tuple(id(p) for p in pats), ref)
    got = _INTERN.get(key)
    if got is None:
        got = SPattern(kind, expr, pats, ref, nullable)
        _INTERN[key] = got
    return got


EMPTY_PAT = _mk(EMPTY, nullable=True)
ZANY_PAT = _mk(ZANY, nullable=True)
EMPTY_SET = _mk(NOT, pats=(ZANY_PAT,), nullable=False)


def _sort_key(p: SPattern):
    return p.pid


def not_pat(p: SPattern) -> SPattern:
    if p.kind == NOT:
        return p.pats[0]
    return _mk(NOT, pats=(p,), nullable=not p.nullable)


def node_pat(e: Expr, p: SPattern) -> SPattern:
    if const_bool_value(e) is False:
        return EMPTY_SET
    return _mk(NODE, expr=e, pats=(p,), nullable=False)


def concat_pat(a: SPattern, b: SPattern) -> SPattern:
    if a is EMPTY_SET or b is EMPTY_SET:
        return EMPTY_SET
    if a is EMPTY_PAT:
        return b
    if b is EMPTY_PAT:
        return a
    if a.kind == CONCAT:
        return concat_pat(a.pats[0], concat_pat(a.pats[1], b))
    if a is ZANY_PAT and b.kind == CONCAT and b.pats[1] is ZANY_PAT:
        return contains_pat(b.pats[0])
    return _mk(CONCAT, pats=(a, b), nullable=a.nullable and b.nullable)


def contains_pat(p: SPattern) -> SPattern:
    if p is EMPTY_PAT:
        return ZANY_PAT
    if p is ZANY_PAT or p is EMPTY_SET:
        return p
    return _mk(CONTAINS, pats=(p,), nullable=p.nullable)


def optional_pat(p: SPattern) -> SPattern:
    if p is EMPTY_PAT or p.kind == OPTIONAL:
        return p
    return _mk(OPTIONAL, pats=(p,), nullable=True)


def zero_or_more_pat(p: SPattern) -> SPattern:
    if p.kind == ZERO_OR_MORE:
        return p
    return _mk(ZERO_OR_MORE, pats=(p,), nullable=True)


def _is_leaf(p: SPattern) -> bool:
    return p.kind == NODE and p.pats[0] is EMPTY_PAT


def _merge_nodes(ps: list, expr_merger, pat_merger) -> list:
    """Merge leaf nodes via expr_merger and equal-name nodes via pat_merger
    (Smart.hs:318-332)."""
    leaves = [p for p in ps if _is_leaf(p)]
    others = [p for p in ps if not _is_leaf(p)]
    out = []
    if leaves:
        e = leaves[0].expr
        for p in leaves[1:]:
            e = expr_merger(e, p.expr)
        out.append(node_pat(e, EMPTY_PAT))
    # group non-leaf nodes by equal name expr
    by_expr: Dict[Expr, list] = {}
    rest = []
    for p in others:
        if p.kind == NODE:
            by_expr.setdefault(p.expr, []).append(p)
        else:
            rest.append(p)
    for e, group in by_expr.items():
        child = group[0].pats[0]
        for p in group[1:]:
            child = pat_merger(child, p.pats[0])
        out.append(node_pat(e, child))
    out.extend(rest)
    return out


def or_pat(a: SPattern, b: SPattern) -> SPattern:
    ps = _flatten(OR, a) + _flatten(OR, b)
    return _or_set(dict.fromkeys(ps))


def _or_set(psd: dict) -> SPattern:
    ps = list(psd)
    if len(ps) == 1:
        return ps[0]
    if ZANY_PAT in psd:
        return ZANY_PAT
    ps = [p for p in ps if p is not EMPTY_SET]
    if len(ps) == 1:
        return ps[0]
    if not ps:
        return EMPTY_SET
    if all(p.nullable for p in ps):
        ps2 = [p for p in ps if p is not EMPTY_PAT]
        ps = ps2 if ps2 else ps
    if len(ps) == 1:
        return ps[0]
    ps = _merge_nodes(ps, or_expr, or_pat)
    ps = list(dict.fromkeys(ps))
    if len(ps) == 1:
        return ps[0]
    ps.sort(key=_sort_key)
    return _mk(OR, pats=tuple(ps), nullable=any(p.nullable for p in ps))


def and_pat(a: SPattern, b: SPattern) -> SPattern:
    ps = _flatten(AND, a) + _flatten(AND, b)
    return _and_set(dict.fromkeys(ps))


def _and_set(psd: dict) -> SPattern:
    ps = list(psd)
    if len(ps) == 1:
        return ps[0]
    if EMPTY_SET in psd:
        return EMPTY_SET
    ps = [p for p in ps if p is not ZANY_PAT]
    if len(ps) == 1:
        return ps[0]
    if not ps:
        return ZANY_PAT
    if EMPTY_PAT in ps:
        return EMPTY_PAT if all(p.nullable for p in ps) else EMPTY_SET
    ps = _merge_nodes(ps, and_expr, and_pat)
    ps = list(dict.fromkeys(ps))
    if len(ps) == 1:
        return ps[0]
    ps.sort(key=_sort_key)
    return _mk(AND, pats=tuple(ps), nullable=all(p.nullable for p in ps))


def interleave_pat(a: SPattern, b: SPattern) -> SPattern:
    ps = _flatten(INTERLEAVE, a) + _flatten(INTERLEAVE, b)
    return _interleave_list(ps)


def _interleave_list(ps: list) -> SPattern:
    # NOTE: interleave is NOT idempotent — keep duplicates (Smart.hs:371-384).
    if any(p is EMPTY_SET for p in ps):
        return EMPTY_SET
    if all(p is EMPTY_PAT for p in ps):
        return EMPTY_PAT
    ps = [p for p in ps if p is not EMPTY_PAT]
    if len(ps) == 1:
        return ps[0]
    if any(p is ZANY_PAT for p in ps):
        ps = [ZANY_PAT] + [p for p in ps if p is not ZANY_PAT]
        if len(ps) == 1:
            return ZANY_PAT
    ps.sort(key=_sort_key)
    return _mk(INTERLEAVE, pats=tuple(ps), nullable=all(p.nullable for p in ps))


def _flatten(kind: str, p: SPattern) -> list:
    if p.kind == kind:
        return list(p.pats)
    return [p]


def unescapable(p: SPattern) -> bool:
    """Short-circuit check: the pattern's verdict can no longer change
    (Smart.hs:396-399)."""
    return p is ZANY_PAT or p is EMPTY_SET


def to_str(p: SPattern) -> str:
    k = p.kind
    if k == EMPTY:
        return "<empty>"
    if k == ZANY:
        return "*"
    if k == NODE:
        return f"{p.expr}:{to_str(p.pats[0])}"
    if k == OR:
        return "(" + "|".join(to_str(c) for c in p.pats) + ")"
    if k == AND:
        return "(" + "&".join(to_str(c) for c in p.pats) + ")"
    if k == NOT:
        return f"!({to_str(p.pats[0])})"
    if k == CONCAT:
        return f"[{to_str(p.pats[0])},{to_str(p.pats[1])}]"
    if k == INTERLEAVE:
        return "{" + ";".join(to_str(c) for c in p.pats) + "}"
    if k == ZERO_OR_MORE:
        return f"({to_str(p.pats[0])})*"
    if k == OPTIONAL:
        return f"({to_str(p.pats[0])})?"
    if k == CONTAINS:
        return f".{to_str(p.pats[0])}"
    if k == REF:
        return f"@{p.ref}"
    raise AssertionError(k)


class SGrammar:
    """A compiled grammar: reference name → smart pattern."""

    __slots__ = ("refs",)

    def __init__(self, refs: Dict[str, SPattern]):
        self.refs = refs

    def lookup(self, name: str) -> SPattern:
        return self.refs[name]

    @property
    def main(self) -> SPattern:
        return self.refs["main"]


def ref_pat(null_refs: Dict[str, bool], name: str) -> SPattern:
    if name not in null_refs:
        raise RelapseError(f"no reference named: {name}")
    return _mk(REF, ref=name, nullable=null_refs[name])


def compile_grammar(g: ast.Grammar) -> SGrammar:
    """AST grammar → smart grammar (Smart.hs:43-55)."""
    ast.lookup_ref(g, "main")
    if ast.has_recursion(g):
        raise RelapseError("recursion without interleaved treenode not supported")
    null_refs = {name: ast.nullable(g, p) for name, p in g.items()}
    return SGrammar({name: _smart(null_refs, p) for name, p in g.items()})


def _smart(null_refs: Dict[str, bool], p: ast.Pattern) -> SPattern:
    if isinstance(p, ast.Empty):
        return EMPTY_PAT
    if isinstance(p, ast.ZAny):
        return ZANY_PAT
    if isinstance(p, ast.Node):
        return node_pat(p.expr, _smart(null_refs, p.pat))
    if isinstance(p, ast.Or):
        return or_pat(_smart(null_refs, p.left), _smart(null_refs, p.right))
    if isinstance(p, ast.And):
        return and_pat(_smart(null_refs, p.left), _smart(null_refs, p.right))
    if isinstance(p, ast.Not):
        return not_pat(_smart(null_refs, p.pat))
    if isinstance(p, ast.Concat):
        return concat_pat(_smart(null_refs, p.left), _smart(null_refs, p.right))
    if isinstance(p, ast.Interleave):
        return interleave_pat(_smart(null_refs, p.left), _smart(null_refs, p.right))
    if isinstance(p, ast.ZeroOrMore):
        return zero_or_more_pat(_smart(null_refs, p.pat))
    if isinstance(p, ast.Optional):
        return optional_pat(_smart(null_refs, p.pat))
    if isinstance(p, ast.Contains):
        return contains_pat(_smart(null_refs, p.pat))
    if isinstance(p, ast.Reference):
        return ref_pat(null_refs, p.name)
    raise TypeError(f"unknown pattern {p!r}")
