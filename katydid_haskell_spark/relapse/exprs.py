"""Typed predicate expressions — the Relapse leaf-expression standard library.

Behavioral parity targets (see SURVEY.md §2.2; all citations are to
``/root/reference/src/Data/Katydid/Relapse/``):

- the 18-function stdlib dispatched by name (``Exprs.hs:29-47``) and the
  builtin symbol sugar ``== != < > <= >= ~= *= ^= $= ::``
  (``Exprs.hs:56-79``);
- **error-as-false**: comparison functions convert evaluation errors (e.g. a
  type-mismatched variable) to ``False`` (``Exprs/Compare.hs:51-53``), and
  ``not`` converts errors to ``True`` (``Exprs/Logic.hs:26-32``).  Other
  functions propagate errors;
- constant folding of var-free expressions at construction time
  (``Expr.hs:487-542``) and the and/or simplifications of
  ``Exprs/Logic.hs:55-134``.

Expressions are frozen dataclasses, so structural equality and hashing come
for free — the analogue of the reference's hash-consed ``Desc``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from .labels import (
    BOOL,
    BYTES,
    DOUBLE,
    INT,
    SCALAR_TYPES,
    STRING,
    UINT,
    Label,
)


class RelapseError(Exception):
    """A compile-time error: parse failure, type mismatch, unknown function."""


class EvalError(Exception):
    """A runtime evaluation error (e.g. variable type mismatch)."""


# ---------------------------------------------------------------------------
# Expression IR
# ---------------------------------------------------------------------------


class Expr:
    """Base class; subclasses are frozen dataclasses with a ``ty`` field."""

    ty: str

    @property
    def has_var(self) -> bool:
        raise NotImplementedError


@dataclass(frozen=True)
class Const(Expr):
    ty: str
    value: Any

    @property
    def has_var(self) -> bool:
        return False

    def __str__(self) -> str:
        return _const_str(self.ty, self.value)


@dataclass(frozen=True)
class Var(Expr):
    ty: str

    @property
    def has_var(self) -> bool:
        return True

    def __str__(self) -> str:
        return "$[]byte" if self.ty == BYTES else f"${self.ty}"


@dataclass(frozen=True)
class Func(Expr):
    name: str
    ty: str
    args: tuple  # tuple[Expr, ...]

    @property
    def has_var(self) -> bool:
        return any(a.has_var for a in self.args)

    def __str__(self) -> str:
        return f"{self.name}({','.join(str(a) for a in self.args)})"


def _const_str(ty: str, value: Any) -> str:
    if ty == BOOL:
        return "true" if value else "false"
    if ty == STRING:
        return '"' + str(value).replace("\\", "\\\\").replace('"', '\\"') + '"'
    if ty == UINT:
        return f"uint({value})"
    if ty == DOUBLE:
        return f"double({value})"
    if ty == BYTES:
        return "[]byte{" + ",".join(str(b) for b in value) + "}"
    if ty.startswith("[]"):
        inner = ty[2:]
        return ty + "{" + ",".join(_const_str(inner, v) for v in value) + "}"
    return str(value)


TRUE = Const(BOOL, True)
FALSE = Const(BOOL, False)


def const_bool_value(e: Expr) -> Optional[bool]:
    """``evalConst`` analogue for booleans: value if constant, else None."""
    if isinstance(e, Const) and e.ty == BOOL:
        return bool(e.value)
    return None


# ---------------------------------------------------------------------------
# Evaluation against a Label
# ---------------------------------------------------------------------------


def eval_expr(e: Expr, label: Label) -> Any:
    """Evaluate an expression against a label. Raises EvalError on mismatch."""
    if isinstance(e, Const):
        return e.value
    if isinstance(e, Var):
        if label.ty != e.ty:
            raise EvalError(f"expected {e.ty}, got {label.ty}")
        return label.value
    assert isinstance(e, Func)
    return _EVAL[e.name](e, label)


def eval_bool_or_false(e: Expr, label: Label) -> bool:
    """Evaluate a bool expr; errors become False.

    This is the semantics observed at the node-predicate position: all
    builtin comparisons already convert errors to False, and the engine
    treats a propagated error from e.g. ``hasPrefix`` as no-match.
    """
    try:
        return bool(eval_expr(e, label))
    except EvalError:
        return False


def _eval_cmp(op: Callable[[Any, Any], bool]) -> Callable[[Func, Label], bool]:
    # Compare.hs: eval errors on either side → False, never an exception.
    def run(e: Func, label: Label) -> bool:
        try:
            a = eval_expr(e.args[0], label)
            b = eval_expr(e.args[1], label)
        except EvalError:
            return False
        return op(a, b)

    return run


def _eval_not(e: Func, label: Label) -> bool:
    # Logic.hs:26-32: error → True.
    try:
        return not eval_expr(e.args[0], label)
    except EvalError:
        return True


def _eval_and(e: Func, label: Label) -> bool:
    # Logic.hs defaultAnd: `(&&) <$> eval a v <*> eval b v` — applicative over
    # Either, so an EvalError on EITHER side propagates to the node root (which
    # converts it to False) even when the other side alone would decide the
    # result.  No Python short-circuit: that would let `and(False, <error>)`
    # return False where the reference (and the Catalyst lowering, which
    # propagates StaticEvalError through and/or) yields error->False... which
    # happens to agree for `and`, but `or(True, <error>)` must be error->False,
    # not True.  Evaluate both sides unconditionally.
    a = bool(eval_expr(e.args[0], label))
    b = bool(eval_expr(e.args[1], label))
    return a and b


def _eval_or(e: Func, label: Label) -> bool:
    # Logic.hs orExpr': `(||) <$> eval a v <*> eval b v` — see _eval_and.
    a = bool(eval_expr(e.args[0], label))
    b = bool(eval_expr(e.args[1], label))
    return a or b


def _eval_contains(e: Func, label: Label) -> bool:
    a = eval_expr(e.args[0], label)
    b = eval_expr(e.args[1], label)
    if e.args[1].ty == STRING:
        return b in a  # substring: second arg is the needle
    return a in b  # membership: second arg is the list


def _eval_elem(e: Func, label: Label) -> Any:
    xs = eval_expr(e.args[0], label)
    i = eval_expr(e.args[1], label)
    if i < 0 or i >= len(xs):
        raise EvalError("elem index out of range")
    return xs[i]


def _eval_length(e: Func, label: Label) -> int:
    return len(eval_expr(e.args[0], label))


def _eval_has_prefix(e: Func, label: Label) -> bool:
    s = eval_expr(e.args[0], label)
    p = eval_expr(e.args[1], label)
    return s.startswith(p)


def _eval_has_suffix(e: Func, label: Label) -> bool:
    s = eval_expr(e.args[0], label)
    p = eval_expr(e.args[1], label)
    return s.endswith(p)


def _eval_regex(e: Func, label: Label) -> bool:
    # regexExpr(pattern, subject): unanchored search (POSIX `=~` behavior).
    pat = eval_expr(e.args[0], label)
    subj = eval_expr(e.args[1], label)
    return re.search(pat, subj) is not None


def _eval_to_lower(e: Func, label: Label) -> str:
    return eval_expr(e.args[0], label).lower()


def _eval_to_upper(e: Func, label: Label) -> str:
    return eval_expr(e.args[0], label).upper()


def _eval_type(e: Func, label: Label) -> bool:
    # Type.hs: true iff the variable evaluates without a type error.
    try:
        eval_expr(e.args[0], label)
        return True
    except EvalError:
        return False


import operator as _op

_EVAL: dict[str, Callable[[Func, Label], Any]] = {
    "eq": _eval_cmp(_op.eq),
    "ne": _eval_cmp(_op.ne),
    "ge": _eval_cmp(_op.ge),
    "gt": _eval_cmp(_op.gt),
    "le": _eval_cmp(_op.le),
    "lt": _eval_cmp(_op.lt),
    "contains": _eval_contains,
    "elem": _eval_elem,
    "length": _eval_length,
    "not": _eval_not,
    "and": _eval_and,
    "or": _eval_or,
    "hasPrefix": _eval_has_prefix,
    "hasSuffix": _eval_has_suffix,
    "regex": _eval_regex,
    "toLower": _eval_to_lower,
    "toUpper": _eval_to_upper,
    "type": _eval_type,
}


# ---------------------------------------------------------------------------
# Builders (the mk*Expr layer): type checking + const folding + simplification
# ---------------------------------------------------------------------------


def _assert_ty(e: Expr, ty: str, fname: str) -> Expr:
    if e.ty != ty:
        raise RelapseError(f"{fname}: expected {ty}, got {e.ty}")
    return e


def _assert_args(name: str, args: list, n: int) -> None:
    if len(args) != n:
        raise RelapseError(f"{name}: expected {n} args, got {len(args)}")


def _fold(e: Expr) -> Expr:
    """Constant-fold a var-free Func (the ``trim*`` analogue)."""
    if isinstance(e, Func) and not e.has_var:
        try:
            v = _EVAL[e.name](e, Label(STRING, ""))  # label unused: no vars
        except EvalError:
            return e  # constant error: keep, evaluates to error at runtime
        return Const(e.ty, v)
    return e


_ORDERED = (INT, UINT, DOUBLE, BYTES, STRING, BOOL)


def _mk_compare(name: str, args: list) -> Expr:
    _assert_args(name, args, 2)
    a, b = args
    if a.ty != b.ty or a.ty not in SCALAR_TYPES:
        raise RelapseError(f"{name}: mismatched types {a.ty} vs {b.ty}")
    if name not in ("eq", "ne") and a.ty not in (INT, UINT, DOUBLE, BYTES, STRING):
        raise RelapseError(f"{name}: type {a.ty} is not ordered")
    return _fold(Func(name, BOOL, (a, b)))


def mk_not(args: list) -> Expr:
    _assert_args("not", args, 1)
    e = _assert_ty(args[0], BOOL, "not")
    return not_expr(e)


def not_expr(e: Expr) -> Expr:
    """Negation with normalization: double-negation and De Morgan pushdown
    (semantics-preserving subset of the reference's ``notDesc``,
    ``Logic.hs:36-51``)."""
    c = const_bool_value(e)
    if c is not None:
        return FALSE if c else TRUE
    if isinstance(e, Func):
        if e.name == "not":
            return e.args[0]
        if e.name == "and":
            return or_expr(not_expr(e.args[0]), not_expr(e.args[1]))
        if e.name == "or":
            return and_expr(not_expr(e.args[0]), not_expr(e.args[1]))
    return Func("not", BOOL, (e,))


def _var_and_const(e: Expr) -> Optional[Const]:
    """If e is a 2-arg func over (var, const) in either order, the const."""
    if not isinstance(e, Func) or len(e.args) != 2:
        return None
    a, b = e.args
    if isinstance(a, Var) and isinstance(b, Const):
        return b
    if isinstance(b, Var) and isinstance(a, Const):
        return a
    return None


def and_expr(a: Expr, b: Expr) -> Expr:
    # Logic.hs:65-104 simplifications.
    ca, cb = const_bool_value(a), const_bool_value(b)
    if ca is False or cb is False:
        return FALSE
    if ca is True:
        return b
    if cb is True:
        return a
    if a == b:
        return a
    if isinstance(a, Func) and a.name == "not" and a.args[0] == b:
        return FALSE
    if isinstance(b, Func) and b.name == "not" and b.args[0] == a:
        return FALSE
    if isinstance(a, Func) and isinstance(b, Func):
        va, vb = _var_and_const(a), _var_and_const(b)
        if va is not None and vb is not None:
            if a.name == "eq" and b.name == "eq":
                return a if va == vb else FALSE
            if a.name == "eq" and b.name == "ne":
                return FALSE if va == vb else a
            if a.name == "ne" and b.name == "eq":
                return FALSE if va == vb else b
    return Func("and", BOOL, (a, b))


def or_expr(a: Expr, b: Expr) -> Expr:
    # Logic.hs:118-134 simplifications.
    ca, cb = const_bool_value(a), const_bool_value(b)
    if ca is True or cb is True:
        return TRUE
    if ca is False:
        return b
    if cb is False:
        return a
    if a == b:
        return a
    if isinstance(a, Func) and a.name == "not" and a.args[0] == b:
        return TRUE
    if isinstance(b, Func) and b.name == "not" and b.args[0] == a:
        return TRUE
    return Func("or", BOOL, (a, b))


def mk_and(args: list) -> Expr:
    _assert_args("and", args, 2)
    return and_expr(
        _assert_ty(args[0], BOOL, "and"), _assert_ty(args[1], BOOL, "and")
    )


def mk_or(args: list) -> Expr:
    _assert_args("or", args, 2)
    return or_expr(_assert_ty(args[0], BOOL, "or"), _assert_ty(args[1], BOOL, "or"))


def mk_contains(args: list) -> Expr:
    _assert_args("contains", args, 2)
    a, b = args
    if b.ty == STRING and a.ty == STRING:
        return _fold(Func("contains", BOOL, (a, b)))
    if b.ty == "[]" + a.ty and a.ty in (STRING, INT, UINT):
        return _fold(Func("contains", BOOL, (a, b)))
    raise RelapseError(f"contains: unsupported types ({a.ty}, {b.ty})")


def mk_elem(args: list) -> Expr:
    _assert_args("elem", args, 2)
    a, b = args
    if not a.ty.startswith("[]") or a.ty == BYTES:
        raise RelapseError(f"elem: first arg must be a list, got {a.ty}")
    _assert_ty(b, INT, "elem")
    return _fold(Func("elem", a.ty[2:], (a, b)))


def mk_length(args: list) -> Expr:
    _assert_args("length", args, 1)
    a = args[0]
    if not (a.ty.startswith("[]") or a.ty in (STRING, BYTES)):
        raise RelapseError(f"length: unsupported type {a.ty}")
    return _fold(Func("length", INT, (a,)))


def _mk_string2(name: str) -> Callable[[list], Expr]:
    def mk(args: list) -> Expr:
        _assert_args(name, args, 2)
        a = _assert_ty(args[0], STRING, name)
        b = _assert_ty(args[1], STRING, name)
        return _fold(Func(name, BOOL, (a, b)))

    return mk


def _mk_regex(args: list) -> Expr:
    """regex(pattern, subject) with the dialect-portability gate: a
    CONSTANT pattern outside the portable Python/Java/RE2 common subset is
    a compile error (translate-or-reject, SURVEY §7.3.5) — never a
    silently path-divergent match.  The TRANSLATE arm (round 8): class
    escapes are rewritten to explicit ASCII classes here, at
    construction, so the Python engines, the Catalyst rlike lowering and
    every oracle mirror all consume the identical dialect-normalized
    pattern text (Python's Unicode \\s matched NBSP where Java's ASCII
    \\s did not — a measured three-paths-agree break).  Dynamic
    (variable) patterns can't be vetted statically; they stay confined
    to the interpreted paths (the lowering already rejects non-constant
    patterns)."""
    pat = args[0]
    if isinstance(pat, Const) and pat.ty == STRING:
        from .regex_dialect import translate_portable

        translated = translate_portable(str(pat.value))
        if translated != pat.value:
            args = [Const(STRING, translated)] + list(args[1:])
    return _mk_string2("regex")(args)


def _mk_string1(name: str) -> Callable[[list], Expr]:
    def mk(args: list) -> Expr:
        _assert_args(name, args, 1)
        a = _assert_ty(args[0], STRING, name)
        return _fold(Func(name, STRING, (a,)))

    return mk


def mk_type(args: list) -> Expr:
    _assert_args("type", args, 1)
    if not isinstance(args[0], Var):
        raise RelapseError("type: argument must be a variable")
    return Func("type", BOOL, tuple(args))


STDLIB: dict[str, Callable[[list], Expr]] = {
    "eq": lambda args: _mk_compare("eq", args),
    "ne": lambda args: _mk_compare("ne", args),
    "ge": lambda args: _mk_compare("ge", args),
    "gt": lambda args: _mk_compare("gt", args),
    "le": lambda args: _mk_compare("le", args),
    "lt": lambda args: _mk_compare("lt", args),
    "contains": mk_contains,
    "elem": mk_elem,
    "length": mk_length,
    "not": mk_not,
    "and": mk_and,
    "or": mk_or,
    "hasPrefix": _mk_string2("hasPrefix"),
    "hasSuffix": _mk_string2("hasSuffix"),
    "regex": lambda args: _mk_regex(args),
    "toLower": _mk_string1("toLower"),
    "toUpper": _mk_string1("toUpper"),
    "type": mk_type,
}

# MkFunc analogue: user libraries are dicts name -> (args -> Expr).
MkFunc = Callable[[str, list], Expr]


def register_eval(name: str, fn: Callable[[Func, Label], Any]) -> None:
    """Register the runtime evaluator for a user-defined function name
    (the ``MkFunc`` injection point of ``Relapse.hs:51-54``)."""
    _EVAL[name] = fn


def simple_udf(name: str, arg_tys: tuple, rty: str, impl: Callable) -> Callable[[list], Expr]:
    """Build a (type-checked, const-folding) builder for a user function
    whose impl takes the evaluated argument values.  Mirrors the helper
    surface of ``Expr.hs:80-102,206-347`` (``assertArgs*``/``mk*Expr``)."""

    def run(e: Func, label: Label):
        return impl(*[eval_expr(a, label) for a in e.args])

    register_eval(name, run)

    def builder(args: list) -> Expr:
        _assert_args(name, args, len(arg_tys))
        for a, ty in zip(args, arg_tys):
            _assert_ty(a, ty, name)
        return _fold(Func(name, rty, tuple(args)))

    return builder


def mk_expr(name: str, args: list) -> Expr:
    try:
        builder = STDLIB[name]
    except KeyError:
        raise RelapseError(f"unknown function: {name}") from None
    return builder(args)


_SYMBOL_TO_NAME = {
    "==": "eq",
    "!=": "ne",
    "<": "lt",
    ">": "gt",
    "<=": "le",
    ">=": "ge",
    "~=": "regex",
    "*=": "contains",
    "^=": "hasPrefix",
    "$=": "hasSuffix",
    "::": "type",
}


def const_to_var(e: Expr) -> Var:
    ty = e.ty[2:] if e.ty.startswith("[]") and e.ty != BYTES else e.ty
    return Var(ty)


def mk_builtin(symbol: str, e: Expr) -> Expr:
    """Builtin symbol sugar (``Exprs.hs:56-79``): inserts the implicit
    variable — ``== 5`` means ``eq($int, 5)``, ``~= "p"`` means
    ``regex("p", $string)``."""
    name = _SYMBOL_TO_NAME.get(symbol)
    if name is None:
        raise RelapseError(f"unexpected builtin symbol: {symbol}")
    if name == "type":
        return mk_expr(name, [e])
    if name == "regex":
        return mk_expr(name, [e, const_to_var(e)])
    return mk_expr(name, [const_to_var(e), e])
