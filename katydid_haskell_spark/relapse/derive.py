"""Brzozowski tree-derivative engine with memoization.

Re-creates the algorithm of ``/root/reference/src/Data/Katydid/Relapse/``
``Derive.hs`` (readable version) + ``MemDerive.hs`` (memoized production
version): for each tree node, compute the derivative of the current pattern
set w.r.t. the node's label ("call", Derive.hs:42-60), recurse into
children, then fold nullability back up ("return", Derive.hs:67-110).  The
memo tables are shared across all input trees (MemDerive.hs:41-81) — this is
the lazily-constructed visibly-pushdown-automaton that the pandas-UDF
automaton path (:mod:`.automaton`) broadcasts to executors.

State canonicalization mirrors ``Zip.hs:29-50``: pattern lists are deduped
and stripped of constant-verdict patterns (ZAny / emptySet) before recursing,
shrinking the memo key space.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

from .exprs import eval_bool_or_false
from .labels import Label, TreeNode
from .smart import (
    CONCAT,
    CONTAINS,
    EMPTY,
    EMPTY_PAT,
    EMPTY_SET,
    INTERLEAVE,
    NODE,
    NOT,
    OPTIONAL,
    OR,
    AND,
    REF,
    ZANY,
    ZANY_PAT,
    ZERO_OR_MORE,
    SGrammar,
    SPattern,
    and_pat,
    concat_pat,
    contains_pat,
    interleave_pat,
    not_pat,
    or_pat,
    unescapable,
    zero_or_more_pat,
)

# An IfExpr is (cond_expr, then_pattern, else_pattern): evaluated against a
# node label it contributes one child pattern (Derive.hs:48, IfExprs.hs).
IfExpr = Tuple[object, SPattern, SPattern]
Pats = Tuple[SPattern, ...]


def derive_calls(g: SGrammar, ps: Pats) -> Tuple[IfExpr, ...]:
    """The "call" step: pattern list → if-expression list (Derive.hs:42-60)."""
    out: List[IfExpr] = []
    for p in ps:
        _calls(g, p, out)
    return tuple(out)


def _calls(g: SGrammar, p: SPattern, out: List[IfExpr]) -> None:
    k = p.kind
    if k in (EMPTY, ZANY):
        return
    if k == NODE:
        out.append((p.expr, p.pats[0], EMPTY_SET))
        return
    if k == CONCAT:
        l, r = p.pats
        _calls(g, l, out)
        if l.nullable:
            _calls(g, r, out)
        return
    if k in (OR, AND, INTERLEAVE):
        for c in p.pats:
            _calls(g, c, out)
        return
    if k in (ZERO_OR_MORE, NOT, CONTAINS, OPTIONAL):
        _calls(g, p.pats[0], out)
        return
    if k == REF:
        _calls(g, g.lookup(p.ref), out)
        return
    raise AssertionError(k)


def eval_if_exprs(ifs: Tuple[IfExpr, ...], label: Label) -> Pats:
    """Evaluate the label against every condition, with per-label dedup of
    identical conditions (the IfExprs.hs:56-66 dedup, done at eval time)."""
    cache: Dict[object, bool] = {}
    out = []
    for cond, thn, els in ifs:
        v = cache.get(cond)
        if v is None:
            v = eval_bool_or_false(cond, label)
            cache[cond] = v
        out.append(thn if v else els)
    return tuple(out)


def derive_returns(g: SGrammar, ps: Pats, nulls: Tuple[bool, ...]) -> Pats:
    """The "return" step: replace each Node with Empty/emptySet according to
    child nullability and rebuild (Derive.hs:67-110)."""
    out = []
    idx = 0
    for p in ps:
        dp, idx = _returns(g, p, nulls, idx)
        out.append(dp)
    assert idx == len(nulls)
    return tuple(out)


def _returns(g: SGrammar, p: SPattern, ns: Tuple[bool, ...], i: int):
    k = p.kind
    if k == EMPTY:
        return EMPTY_SET, i
    if k == ZANY:
        return ZANY_PAT, i
    if k == NODE:
        return (EMPTY_PAT if ns[i] else EMPTY_SET), i + 1
    if k == CONCAT:
        l, r = p.pats
        dl, i = _returns(g, l, ns, i)
        if l.nullable:
            dr, i = _returns(g, r, ns, i)
            return or_pat(concat_pat(dl, r), dr), i
        return concat_pat(dl, r), i
    if k == OR:
        dps, i = _map_returns(g, p.pats, ns, i)
        out = dps[0]
        for dp in dps[1:]:
            out = or_pat(out, dp)
        return out, i
    if k == AND:
        dps, i = _map_returns(g, p.pats, ns, i)
        out = dps[0]
        for dp in dps[1:]:
            out = and_pat(out, dp)
        return out, i
    if k == INTERLEAVE:
        cs = p.pats
        dps, i = _map_returns(g, cs, ns, i)
        # one alternative per branch: that branch consumed the node
        # (Derive.hs:96-101).
        ors = None
        for j, dp in enumerate(dps):
            alt = dp
            for m, c in enumerate(cs):
                if m != j:
                    alt = interleave_pat(alt, c)
            ors = alt if ors is None else or_pat(ors, alt)
        return ors, i
    if k == ZERO_OR_MORE:
        dp, i = _returns(g, p.pats[0], ns, i)
        return concat_pat(dp, p), i
    if k == REF:
        return _returns(g, g.lookup(p.ref), ns, i)
    if k == NOT:
        dp, i = _returns(g, p.pats[0], ns, i)
        return not_pat(dp), i
    if k == CONTAINS:
        dp, i = _returns(g, p.pats[0], ns, i)
        return or_pat(p, contains_pat(dp)), i
    if k == OPTIONAL:
        return _returns(g, p.pats[0], ns, i)
    raise AssertionError(k)


def _map_returns(g: SGrammar, ps: Pats, ns, i: int):
    dps = []
    for p in ps:
        dp, i = _returns(g, p, ns, i)
        dps.append(dp)
    return dps, i


def zippy(ps: Pats):
    """Canonicalize a pattern list (Zip.hs:29-50): drop constant-verdict
    patterns (ZAny / emptySet) and dedup, remembering how to reconstruct the
    nullability list."""
    uniq: List[SPattern] = []
    index: Dict[int, int] = {}
    zipper: List[object] = []
    for p in ps:
        if p is ZANY_PAT:
            zipper.append(True)  # always nullable
        elif p is EMPTY_SET:
            zipper.append(False)  # never nullable
        else:
            j = index.get(id(p))
            if j is None:
                j = len(uniq)
                index[id(p)] = j
                uniq.append(p)
            zipper.append(j)
    return tuple(uniq), tuple(zipper)


def unzip_nulls(zipper: Tuple[object, ...], nulls: Tuple[bool, ...]):
    return tuple(n if isinstance(n, bool) else nulls[n] for n in zipper)


class Mem:
    """Memo tables shared across trees (MemDerive.hs:41-64)."""

    __slots__ = ("calls", "returns")

    def __init__(self):
        self.calls: Dict[tuple, Tuple[IfExpr, ...]] = {}
        self.returns: Dict[tuple, Pats] = {}


class Validator:
    """Memoizing validator — the ``MemDerive.validate`` analogue.

    One instance amortizes automaton construction across many forests
    (``Relapse.hs:65-70``, ``Readme.md:51-56``).
    """

    def __init__(self, g: SGrammar):
        self.g = g
        self.mem = Mem()

    def _deriv(self, ps: Pats, tree: TreeNode) -> Pats:
        if all(unescapable(p) for p in ps):
            return ps
        key = tuple(id(p) for p in ps)
        ifs = self.mem.calls.get(key)
        if ifs is None:
            ifs = derive_calls(self.g, ps)
            self.mem.calls[key] = ifs
        childps = eval_if_exprs(ifs, tree.label)
        zps, zipper = zippy(childps)
        res = zps
        for child in tree.children:
            res = self._deriv(res, child)
        nulls = unzip_nulls(zipper, tuple(p.nullable for p in res))
        rkey = (key, nulls)
        ret = self.mem.returns.get(rkey)
        if ret is None:
            ret = derive_returns(self.g, ps, nulls)
            self.mem.returns[rkey] = ret
        return ret

    def validate(self, forest: Iterable[TreeNode]) -> bool:
        ps: Pats = (self.g.main,)
        for tree in forest:
            ps = self._deriv(ps, tree)
        return len(ps) == 1 and ps[0].nullable


def derive(g: SGrammar, forest: Iterable[TreeNode]) -> SPattern:
    """Unmemoized single-forest derivative (Derive.hs:121-138); returns the
    final derived pattern."""
    v = Validator(g)
    ps: Pats = (g.main,)
    for tree in forest:
        ps = v._deriv(ps, tree)
    if len(ps) != 1:
        raise AssertionError(f"number of patterns is not one: {ps}")
    return ps[0]
