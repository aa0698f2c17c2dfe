"""Dialect-portability gate for ~= patterns (SURVEY §7.3.5): the portable
subset parses; each documented divergent construct is a compile error
naming the offending dialect."""

import pytest

from katydid_haskell_spark.relapse import parse
from katydid_haskell_spark.relapse.exprs import RelapseError

PORTABLE = [
    r"^https?://",
    r"[a-z]{2}$",
    r"(foo|bar)+baz",
    r"(?:ab)*c?",
    r"\d{4}-\d{2}-\d{2}",
    r"\w+@\w+\.\w+",
    r"a.*?b",
    r"[^/:?#]+",
    r"\x41\t\n",
    r"price: \$\d+",
    r"[\]\[-]",
]

REJECTED = [
    (r"(?=abc)", "lookahead"),
    (r"(?<=x)y", "lookbehind"),
    (r"(a)\1", "backreference"),
    (r"\p{Lu}+", r"\p"),
    (r"[[:alpha:]]+", "POSIX"),
    (r"[a-z&&[^bc]]", "intersection"),
    (r"a*+b", "possessive"),
    (r"(?i)abc", "inline flag"),
    (r"\Aabc\Z", "anchor"),
    (r"(?P<name>x)", "named"),
    (r"(?>atomic)", "atomic"),
    ("\\uffff", r"\u"),
    (r"a[bc", "unterminated"),
    (r"[a[b]]", "nested class union (Java) vs literal (Python/RE2)"),
    (r"[\b]", "backspace (Python/Java) vs compile error (RE2)"),
    (r"[\B]", r"\B in class is Java-only"),
    # round 8: \b/\B word chars are Unicode in Python, ASCII in
    # Java/RE2 — divergent on non-ASCII text, no explicit rewrite
    (r"\bword\b", "word boundary uses dialect-specific word chars"),
    (r"a\Bb", "word boundary uses dialect-specific word chars"),
    # negated class escapes INSIDE a class have no textual expansion
    (r"[\S]+", "no portable expansion"),
    (r"[a\D]", "no portable expansion"),
    # round 9: a class escape adjacent to a range dash would SPLICE
    # into a range after expansion ([a\s-x] -> [a \t\n\x0B\f\r-x],
    # whose \r-x range the author never wrote; pre-r8 Python rejected
    # these outright, so acceptance would silently widen the gate)
    (r"[a\s-x]", "escape followed by range dash"),
    (r"[\d-x]", "escape followed by range dash"),
    (r"[a-\d]", "range dash followed by escape"),
    (r"[x\w-y]", "escape followed by range dash"),
]


TRANSLATED = [
    # round 8: class escapes are TRANSLATED to explicit ASCII classes so
    # Python (Unicode sets) and Java/RE2 (ASCII sets) match identically
    # (the measured \s-NBSP three-paths-agree break)
    (r"\d{4}-\d{2}", "[0-9]{4}-[0-9]{2}"),
    (r"a\sb", r"a[ \t\n\x0B\f\r]b"),
    (r"a\Sb", r"a[^ \t\n\x0B\f\r]b"),
    (r"\w+", "[A-Za-z0-9_]+"),
    (r"\W", "[^A-Za-z0-9_]"),
    (r"[\d\w.]+", "[0-9A-Za-z0-9_.]+"),
    (r"[^\s]x", r"[^ \t\n\x0B\f\r]x"),
    (r"^https?://", "^https?://"),  # identity for escape-free patterns
    # round 9: a dash at the CLASS EDGE stays a literal in every
    # dialect — expansion cannot splice it into a range, so these are
    # accepted (pinning the exact boundary of the splice guard)
    (r"[a\s-]", r"[a \t\n\x0B\f\r-]"),
    (r"[-\d]", "[-0-9]"),
    (r"[\d\s]", r"[0-9 \t\n\x0B\f\r]"),
]


@pytest.mark.parametrize("pat,want", TRANSLATED)
def test_class_escapes_translated(pat, want):
    from katydid_haskell_spark.relapse.regex_dialect import (
        translate_portable,
    )

    assert translate_portable(pat) == want


@pytest.mark.parametrize("pat", PORTABLE)
def test_portable_accepted(pat):
    g = parse(f'.url ~= "{pat}"'.replace("\\", "\\\\"))
    assert g is not None


@pytest.mark.parametrize("pat,_why", REJECTED)
def test_divergent_rejected(pat, _why):
    with pytest.raises(RelapseError):
        parse(f'.url ~= "{pat}"'.replace("\\", "\\\\"))
