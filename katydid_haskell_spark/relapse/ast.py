"""Relapse pattern AST — the 12-combinator pattern algebra.

Mirrors the behavior of ``/root/reference/src/Data/Katydid/Relapse/Ast.hs``:
the ``Pattern`` algebra (Ast.hs:31-44), ``nullable`` (Ast.hs:49-61), the
reference map (grammar) helpers, and the recursion detector
(Ast.hs:104-126) — recursion is rejected at compile time, which is what makes
compile-time derivative unrolling sound.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

from .exprs import Expr, RelapseError


@dataclass(frozen=True)
class Pattern:
    pass


@dataclass(frozen=True)
class Empty(Pattern):
    def __str__(self) -> str:
        return "<empty>"


@dataclass(frozen=True)
class ZAny(Pattern):
    def __str__(self) -> str:
        return "*"


@dataclass(frozen=True)
class Node(Pattern):
    expr: Expr
    pat: Pattern

    def __str__(self) -> str:
        return f"{self.expr}:{self.pat}"


@dataclass(frozen=True)
class Or(Pattern):
    left: Pattern
    right: Pattern

    def __str__(self) -> str:
        return f"({self.left}|{self.right})"


@dataclass(frozen=True)
class And(Pattern):
    left: Pattern
    right: Pattern

    def __str__(self) -> str:
        return f"({self.left}&{self.right})"


@dataclass(frozen=True)
class Not(Pattern):
    pat: Pattern

    def __str__(self) -> str:
        return f"!({self.pat})"


@dataclass(frozen=True)
class Concat(Pattern):
    left: Pattern
    right: Pattern

    def __str__(self) -> str:
        return f"[{self.left},{self.right}]"


@dataclass(frozen=True)
class Interleave(Pattern):
    left: Pattern
    right: Pattern

    def __str__(self) -> str:
        return f"{{{self.left};{self.right}}}"


@dataclass(frozen=True)
class ZeroOrMore(Pattern):
    pat: Pattern

    def __str__(self) -> str:
        return f"({self.pat})*"


@dataclass(frozen=True)
class Optional(Pattern):
    pat: Pattern

    def __str__(self) -> str:
        return f"({self.pat})?"


@dataclass(frozen=True)
class Contains(Pattern):
    pat: Pattern

    def __str__(self) -> str:
        return f".{self.pat}"


@dataclass(frozen=True)
class Reference(Pattern):
    name: str

    def __str__(self) -> str:
        return f"@{self.name}"


# A grammar is a map from reference name to pattern; entry point is "main".
Grammar = Dict[str, Pattern]


def lookup_ref(g: Grammar, name: str) -> Pattern:
    try:
        return g[name]
    except KeyError:
        raise RelapseError(f"missing reference: {name}") from None


def nullable(g: Grammar, p: Pattern) -> bool:
    """Does the pattern match the empty forest? (Ast.hs:49-61)"""
    if isinstance(p, (Empty, ZAny, ZeroOrMore, Optional)):
        return True
    if isinstance(p, Node):
        return False
    if isinstance(p, Or):
        return nullable(g, p.left) or nullable(g, p.right)
    if isinstance(p, (And, Concat, Interleave)):
        return nullable(g, p.left) and nullable(g, p.right)
    if isinstance(p, Not):
        return not nullable(g, p.pat)
    if isinstance(p, Contains):
        return nullable(g, p.pat)
    if isinstance(p, Reference):
        return nullable(g, lookup_ref(g, p.name))
    raise TypeError(f"unknown pattern {p!r}")


def has_recursion(g: Grammar) -> bool:
    """Recursion detector starting from "main" (Ast.hs:104-126)."""
    return _has_rec(g, frozenset({"main"}), lookup_ref(g, "main"))


def _has_rec(g: Grammar, seen: frozenset, p: Pattern) -> bool:
    if isinstance(p, (Empty, ZAny, Node)):
        return False
    if isinstance(p, (Or, And, Interleave)):
        return _has_rec(g, seen, p.left) or _has_rec(g, seen, p.right)
    if isinstance(p, Concat):
        # The right side is only reachable "at this node depth" if the left
        # is nullable (Ast.hs:116-117).
        return _has_rec(g, seen, p.left) or (
            nullable(g, p.left) and _has_rec(g, seen, p.right)
        )
    if isinstance(p, (Not, ZeroOrMore, Optional, Contains)):
        return _has_rec(g, seen, p.pat)
    if isinstance(p, Reference):
        if p.name in seen:
            return True
        return _has_rec(g, seen | {p.name}, lookup_ref(g, p.name))
    raise TypeError(f"unknown pattern {p!r}")
