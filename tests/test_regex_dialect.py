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
    r"\bword\b",
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
]


@pytest.mark.parametrize("pat", PORTABLE)
def test_portable_accepted(pat):
    g = parse(f'.url ~= "{pat}"'.replace("\\", "\\\\"))
    assert g is not None


@pytest.mark.parametrize("pat,_why", REJECTED)
def test_divergent_rejected(pat, _why):
    with pytest.raises(RelapseError):
        parse(f'.url ~= "{pat}"'.replace("\\", "\\\\"))
