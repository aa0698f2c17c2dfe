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

# Class-escape translation (round 8): Python's \s \d \w are UNICODE sets
# while Java's and RE2's are ASCII — `\s` matched NBSP on the derivative
# engine but not on Catalyst (measured divergence; the three-paths-agree
# invariant breaks on any non-ASCII whitespace/digit/word char).  The
# gate therefore TRANSLATES the six class escapes to explicit ASCII
# classes once, at expression construction, so every engine (and every
# oracle mirror) consumes dialect-identical pattern text — the repo-wide
# explicit-class discipline applied to relapse, and closer to the
# reference's POSIX TDFA (ASCII) semantics.  Negated escapes inside a
# character class (e.g. [\S]) have no textual expansion and are
# rejected; \b/\B word boundaries are rejected for the same reason
# (their word-char set is Unicode in Python, ASCII in Java/RE2).
_CLASS_ESCAPE_OUTSIDE = {
    "d": "[0-9]", "D": "[^0-9]",
    "w": "[A-Za-z0-9_]", "W": "[^A-Za-z0-9_]",
    "s": r"[ \t\n\x0B\f\r]", "S": r"[^ \t\n\x0B\f\r]",
}
_CLASS_ESCAPE_INSIDE = {
    "d": "0-9",
    "w": "A-Za-z0-9_",
    "s": r" \t\n\x0B\f\r",
}

# Known, deliberately-ACCEPTED corner divergences (data-precondition
# guarded rather than rejected, because anchors have no portable
# rewrite):  `$` matches before a TRAILING newline in Python/Java but
# not in RE2 — the in-repo engines agree (corpus pin
# regex_anchor_newline), but an ORACLED rule must never let `$` see
# text that can end in \n.


def check_portable(pattern: str) -> None:
    """Raise RelapseError unless ``pattern`` is in the portable subset."""
    translate_portable(pattern)


def translate_portable(pattern: str) -> str:
    """Validate ``pattern`` against the portable subset and return the
    DIALECT-NORMALIZED text: class escapes rewritten to explicit ASCII
    classes (see ``_CLASS_ESCAPE_OUTSIDE``) so Python/Java/RE2 all match
    the identical character sets.  Every engine must consume the
    translated text — exprs._mk_regex rebuilds the pattern constant with
    it at construction time."""

    def fail(reason: str) -> None:
        raise RelapseError(
            f"regex {pattern!r} is not dialect-portable: {reason} "
            "(pattern must behave identically in Python re, Java regex and "
            "RE2 — see relapse/regex_dialect.py)"
        )

    out: list = []
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
                out.append(pattern[i:i + 4])
                i += 4
                continue
            if e in ("k", "g"):
                fail("named backreferences are unsupported in RE2")
            if e in ("b", "B"):
                if in_class:
                    # [\b] is backspace in Python/Java but a compile error
                    # in RE2 (and DuckDB); \B in a class is Java-only.
                    fail(rf"\{e} inside a character class differs between "
                         "dialects (backspace vs compile error)")
                # round 8: the word-char set behind \b/\B is Unicode in
                # Python re but ASCII in Java/RE2 — divergent on any
                # non-ASCII text, and boundaries have no explicit-class
                # rewrite.
                fail(rf"\{e} word boundaries use Unicode word chars in "
                     "Python but ASCII in Java/RE2 — spell the boundary "
                     "with explicit classes instead")
            if e in _PORTABLE_CLASS_ESCAPES:
                # translate to the explicit ASCII class (the \s-NBSP
                # divergence fix) — Unicode-vs-ASCII set membership is
                # dialect-specific, the explicit class is not.
                if in_class:
                    rep = _CLASS_ESCAPE_INSIDE.get(e)
                    if rep is None:
                        fail(rf"negated class escape \{e} inside a "
                             "character class has no portable expansion — "
                             "use an explicit class")
                    # Range-splice guard (round 9): the expansion must
                    # never be ADJACENT to a range dash, else the
                    # translated text forms a character range the spec
                    # author never wrote ([a\s-x] would become
                    # [a \t\n\x0B\f\r-x], whose \r-x range matches most
                    # printable ASCII; pre-translation Python rejected
                    # it outright).  A '-' just before ']' stays a
                    # literal in every dialect and is allowed.
                    if (pattern[i + 2: i + 3] == "-"
                            and pattern[i + 3: i + 4] not in ("]", "")):
                        fail(rf"\{e} followed by '-' inside a character "
                             "class would splice into a range after "
                             "expansion — move the '-' to the class edge")
                    if (pattern[i - 1: i] == "-" and i >= 2
                            and pattern[i - 2] not in "[^\\"):
                        fail(rf"'-' followed by \{e} inside a character "
                             "class would splice into a range after "
                             "expansion — move the '-' to the class edge")
                    out.append(rep)
                else:
                    out.append(_CLASS_ESCAPE_OUTSIDE[e])
                i += 2
                continue
            if (e in _PORTABLE_CTRL_ESCAPES or e in _PUNCT
                    or e == "\\" or e == " "):
                out.append(pattern[i:i + 2])
                i += 2
                continue
            if e.isalpha():
                fail(rf"escape \{e} is not in the portable subset")
            out.append(pattern[i:i + 2])
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
            out.append(ch)
            i += 1
            continue
        if ch == "[":
            in_class = True
            out.append(ch)
            i += 1
            # leading ^ / ] literal handling is identical across dialects
            if i < n and pattern[i] == "^":
                out.append("^")
                i += 1
            if i < n and pattern[i] == "]":
                out.append("]")
                i += 1
            continue
        if ch == "(":
            if pattern[i + 1: i + 2] == "?":
                nxt = pattern[i + 2: i + 3]
                if nxt == ":":
                    out.append("(?:")
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
            out.append(ch)
            i += 1
            continue
        if ch in ("*", "+", "?"):
            if pattern[i + 1: i + 2] == "+":
                fail("possessive quantifiers are Java-only")
            out.append(ch)
            i += 1
            continue
        if ch == "}":
            if pattern[i + 1: i + 2] == "+":
                fail("possessive quantifiers are Java-only")
            out.append(ch)
            i += 1
            continue
        out.append(ch)
        i += 1
    if in_class:
        fail("unterminated character class")
    translated = "".join(out)
    # finally, it must actually compile as a Python regex
    try:
        _re.compile(translated)
    except _re.error as ex:
        raise RelapseError(f"invalid regex {pattern!r}: {ex}") from None
    return translated
