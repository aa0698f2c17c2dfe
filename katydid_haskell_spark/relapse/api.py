"""The four-function Relapse API — parity with
``/root/reference/src/Data/Katydid/Relapse/Relapse.hs:16-70``."""

from __future__ import annotations

from typing import Iterable, List, Sequence

from . import parser
from .derive import Validator
from .labels import TreeNode
from .parser import UserLib
from .smart import SGrammar, compile_grammar


class Grammar:
    """A compiled relapse grammar (parse → AST → smart compile)."""

    __slots__ = ("sgrammar", "source")

    def __init__(self, sgrammar: SGrammar, source: str):
        self.sgrammar = sgrammar
        self.source = source

    def __repr__(self) -> str:  # pragma: no cover
        return f"Grammar({self.source!r})"


def parse(spec: str) -> Grammar:
    """Parse + compile a Relapse spec (Relapse.hs:43-46). Raises
    :class:`~.exprs.RelapseError` on parse/compile failure."""
    return Grammar(compile_grammar(parser.parse_grammar(spec)), spec)


def parse_with_udfs(user_lib: UserLib, spec: str) -> Grammar:
    """Same, with a user-defined function library (Relapse.hs:51-54)."""
    return Grammar(compile_grammar(parser.parse_grammar(spec, user_lib)), spec)


def validate(g: Grammar, forest: Iterable[TreeNode]) -> bool:
    """Does one forest satisfy the grammar (Relapse.hs:58-61)."""
    return Validator(g.sgrammar).validate(forest)


def filter_forests(g: Grammar, forests: Sequence[Iterable[TreeNode]]) -> List:
    """Keep satisfying forests; memoizes automaton states across inputs
    (Relapse.hs:65-70)."""
    v = Validator(g.sgrammar)
    return [f for f in forests if v.validate(f)]
