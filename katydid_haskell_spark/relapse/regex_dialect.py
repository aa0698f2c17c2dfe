"""Regex dialect portability gate (SURVEY.md §7.3.5).

The reference evaluates ``~=`` with POSIX TDFA (Strings.hs:18); this engine
evaluates the SAME constant pattern in up to three dialects — Python ``re``
(pure derivative engine + automaton UDF), Java ``java.util.regex``
(Catalyst ``rlike`` lowering) and RE2 (DuckDB oracle).  A pattern whose
semantics differ across those dialects silently breaks the
three-paths-agree invariant, so constant patterns are vetted at EXPRESSION
CONSTRUCTION time: only the conservatively-portable common subset is
accepted; anything else is a compile error (translate-or-reject — we
reject, with the reason, rather than silently diverge).

Accepted (identical semantics in Python/Java/RE2): literals, ``.``,
anchors ``^ $``, alternation, greedy/lazy quantifiers ``* + ? {m} {m,n}``,
capturing ``(...)`` and non-capturing ``(?:...)`` groups, character
classes without ``&&``/POSIX-names/nested-``[``, the class escapes ``\\d
\\D \\w \\W \\s \\S``, ``\\b \\B`` word boundaries (outside classes only),
control escapes ``\\n \\r \\t \\f \\v \\xHH`` and escaped punctuation.

Rejected (with the dialect that diverges):
  lookaround / atomic / conditional / named groups — RE2 has none;
  backreferences — RE2 has none;
  ``\\p{...}`` ``\\P{...}`` — Python re has none;
  ``[[:alpha:]]`` POSIX classes — literal chars in Python/Java;
  ``[a&&b]`` — intersection in Java, literal in Python/RE2;
  ``[a[b]]`` — nested-class union in Java, literal in Python/RE2;
  ``[\\b]`` — backspace in Python/Java, compile error in RE2;
  possessive quantifiers ``*+ ++ ?+ {m,n}+`` — Java only;
  inline flags ``(?i)...`` — scoping rules differ;
  ``\\A \\Z \\z \\G \\uXXXX \\0NN \\cX`` — semantics or support differ.
"""

from __future__ import annotations

import re as _re

from .exprs import RelapseError

_PORTABLE_CLASS_ESCAPES = set("dDwWsS")
_PORTABLE_CTRL_ESCAPES = set("nrtfvbB")  # \b is boundary outside a class
_PUNCT = set(r"\.^$|?*+()[]{}-/&~!@#%,:;<>='\"`_")


def check_portable(pattern: str) -> None:
    """Raise RelapseError unless ``pattern`` is in the portable subset."""

    def fail(reason: str) -> None:
        raise RelapseError(
            f"regex {pattern!r} is not dialect-portable: {reason} "
            "(pattern must behave identically in Python re, Java regex and "
            "RE2 — see relapse/regex_dialect.py)"
        )

    n = len(pattern)
    i = 0
    in_class = False
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            if i + 1 >= n:
                fail("trailing backslash")
            e = pattern[i + 1]
            if e in ("p", "P"):
                fail(r"\p{...} property classes are unsupported in Python re")
            if e in ("A", "Z", "z", "G"):
                fail(rf"\{e} anchors differ between dialects")
            if e == "u":
                fail(r"\uXXXX escapes are not RE2 syntax")
            if e == "c":
                fail(r"\cX control escapes differ between dialects")
            if e.isdigit():
                if e == "0":
                    fail("octal escapes differ between dialects")
                fail("backreferences are unsupported in RE2")
            if e == "x":
                m = _re.match(r"x[0-9a-fA-F]{2}", pattern[i + 1:])
                if not m:
                    fail(r"\x must be \xHH for portability")
                i += 4
                continue
            if e in ("k", "g"):
                fail("named backreferences are unsupported in RE2")
            if in_class and e in ("b", "B"):
                # [\b] is backspace in Python/Java but a compile error in
                # RE2 (and DuckDB); \B in a class is Java-only.
                fail(rf"\{e} inside a character class differs between "
                     "dialects (backspace vs compile error)")
            if (e in _PORTABLE_CLASS_ESCAPES or e in _PORTABLE_CTRL_ESCAPES
                    or e in _PUNCT or e == "\\" or e == " "):
                i += 2
                continue
            if e.isalpha():
                fail(rf"escape \{e} is not in the portable subset")
            i += 2
            continue
        if in_class:
            if ch == "&" and i + 1 < n and pattern[i + 1] == "&":
                fail("[a&&b] is class intersection in Java but literal "
                     "elsewhere")
            if ch == "[":
                if i + 1 < n and pattern[i + 1] == ":":
                    fail("[[:name:]] POSIX classes are literal in "
                         "Python/Java")
                # [a[b]] is class UNION in java.util.regex (nested class)
                # but '[' is a literal char in Python re / RE2.
                fail("bare '[' inside a character class is nested-class "
                     "union in Java but literal in Python/RE2 — escape it "
                     r"as \[")
            if ch == "]":
                in_class = False
            i += 1
            continue
        if ch == "[":
            in_class = True
            i += 1
            # leading ^ / ] literal handling is identical across dialects
            if i < n and pattern[i] == "^":
                i += 1
            if i < n and pattern[i] == "]":
                i += 1
            continue
        if ch == "(":
            if pattern[i + 1: i + 2] == "?":
                nxt = pattern[i + 2: i + 3]
                if nxt == ":":
                    i += 3
                    continue
                if nxt in ("=", "!"):
                    fail("lookahead is unsupported in RE2")
                if nxt == "<":
                    if pattern[i + 3: i + 4] in ("=", "!"):
                        fail("lookbehind is unsupported in RE2")
                    fail("named groups differ between dialects")
                if nxt == ">":
                    fail("atomic groups are Java-only")
                if nxt == "(":
                    fail("conditional groups are unsupported in RE2/Python")
                if nxt == "P":
                    fail("(?P...) named groups are Python-only syntax")
                fail("inline flags have dialect-specific scoping")
            i += 1
            continue
        if ch in ("*", "+", "?"):
            if pattern[i + 1: i + 2] == "+":
                fail("possessive quantifiers are Java-only")
            i += 1
            continue
        if ch == "}":
            if pattern[i + 1: i + 2] == "+":
                fail("possessive quantifiers are Java-only")
            i += 1
            continue
        i += 1
    if in_class:
        fail("unterminated character class")
    # finally, it must actually compile as a Python regex
    try:
        _re.compile(pattern)
    except _re.error as ex:
        raise RelapseError(f"invalid regex {pattern!r}: {ex}") from None
