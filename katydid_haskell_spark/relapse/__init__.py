"""The Relapse constraint language: parse → AST → smart compile → execute.

Public API (mirrors the four functions of the reference's
``src/Data/Katydid/Relapse/Relapse.hs:16-70``):

- :func:`parse` — compile a Relapse spec string into a :class:`Grammar`.
- :func:`parse_with_udfs` — same, with user-defined functions injected.
- :func:`validate` — does one labeled tree (forest) satisfy the grammar.
- :func:`filter_forests` — keep the forests that satisfy it, memoizing
  automaton states across inputs.

Spark entry points live in :mod:`.lower` (Catalyst Column compilation) and
:mod:`.automaton` (pandas-UDF derivative automaton for dynamic trees).
"""

from .api import Grammar, parse, parse_with_udfs, validate, filter_forests

__all__ = ["Grammar", "parse", "parse_with_udfs", "validate", "filter_forests"]
