"""Derivative-engine and API tests — ports of DeriveSpec.hs + RelapseSpec.hs."""

import pytest

from katydid_haskell_spark.relapse import (
    filter_forests,
    parse,
    parse_with_udfs,
    validate,
)
from katydid_haskell_spark.relapse.derive import Validator, derive
from katydid_haskell_spark.relapse.exprs import (
    BOOL,
    INT,
    RelapseError,
    simple_udf,
)
from katydid_haskell_spark.relapse.labels import (
    Label,
    decode_json,
    node,
)
from katydid_haskell_spark.relapse.parser import parse_grammar
from katydid_haskell_spark.relapse.smart import compile_grammar


def main_of(spec):
    return compile_grammar(parse_grammar(spec)).main


def test_derive_two_ors():
    # DeriveSpec.hs:31-38: derivative of (== 1 | !(== 2)) wrt node 1 is *
    g = compile_grammar(parse_grammar("(== 1 | !(== 2))"))
    got = derive(g, [node(Label(INT, 1))])
    assert got is main_of("*")


def test_derive_two_interleaves():
    # DeriveSpec.hs:39-48
    g = compile_grammar(parse_grammar("{== 1 ; !(== 2)}"))
    got = derive(g, [node(Label(INT, 1))])
    want = main_of("({<empty>;!(==2)}|{==1;*})")
    assert got is want


def test_parse_success():
    parse("a == 1")


def test_parse_failure():
    with pytest.raises(RelapseError):
        parse("{ a : 1 }")


def test_validate():
    g = parse("a == 1")
    assert validate(g, decode_json('{"a":1}'))
    assert not validate(g, decode_json('{"a":2}'))


def test_filter():
    g = parse("a == 1")
    want = decode_json('{"a":1}')
    other = decode_json('{"a":2}')
    assert filter_forests(g, [want, other]) == [want]


def test_user_defined_function():
    def is_prime(n):
        if n < 2:
            return False
        d = 2
        while d * d <= n:
            if n % d == 0:
                return False
            d += 1
        return True

    builders = {"isPrime": simple_udf("isPrime", (INT,), BOOL, is_prime)}

    def user_lib(name, args):
        if name in builders:
            return builders[name](args)
        raise RelapseError(f"undefined function: {name}")

    g = parse_with_udfs(user_lib, "a->isPrime($int)")
    want = decode_json('{"a":3}')
    other = decode_json('{"a":4}')
    assert filter_forests(g, [want, other]) == [want]


def test_recursion_rejected():
    # same-forest-level recursion is rejected (Smart.hs:46-47, Ast.hs:104-126)
    with pytest.raises(RelapseError):
        parse("#main = @a #a = (@main)*")
    # ...but recursion through a tree node (vertical) is allowed
    g = parse("#main = @a #a = (<empty> | b: @a)")
    from katydid_haskell_spark.relapse.labels import decode_json as dj

    assert validate(g, dj('{"b":{"b":null}}'))
    assert not validate(g, dj('{"c":1}'))


def test_error_as_false():
    # type-mismatched comparison is False, not an error
    g = parse("a == 1")
    assert not validate(g, decode_json('{"a":"x"}'))
    # not(error) is True (Logic.hs:26-32)
    g2 = parse("a: -> not(eq($int, 1))")
    assert validate(g2, decode_json('{"a":"x"}'))


def test_null_is_absent_node():
    # JSON null → no node (Json.hs:40): a:* still matches (empty children),
    # a == 1 does not.
    g_any = parse("a:*")
    g_eq = parse("a == 1")
    f = decode_json('{"a":null}')
    assert validate(g_any, f)
    assert not validate(g_eq, f)


def test_forest_top_level_array():
    # [1,2] is a forest of two index-labeled nodes
    g = parse("[0:==1, 1:==2]")
    assert validate(g, decode_json("[1,2]"))
    assert not validate(g, decode_json("[1,3]"))
    assert not validate(g, decode_json("[1]"))


def test_memoization_across_trees():
    g = parse('(a == 1 | b == "x")')
    v = Validator(g.sgrammar)
    forests = [decode_json('{"a":1}'), decode_json('{"b":"x"}'),
               decode_json('{"a":2}')] * 10
    results = [v.validate(f) for f in forests]
    assert results == [True, True, False] * 10
    # memo tables were reused: states far fewer than inputs
    assert len(v.mem.calls) < 10


def test_contains_pattern():
    g = parse(".b == 2")
    assert validate(g, decode_json('{"a":1,"b":2,"c":3}'))
    assert not validate(g, decode_json('{"a":1,"c":3}'))


def test_zero_or_more():
    g = parse("(_ == 1)*")  # any name, value 1, zero or more
    assert validate(g, decode_json('{"a":1,"b":1}'))
    assert validate(g, decode_json("{}"))
    assert not validate(g, decode_json('{"a":1,"b":2}'))


def test_string_ops():
    g = parse('a ^= "foo"')
    assert validate(g, decode_json('{"a":"foobar"}'))
    assert not validate(g, decode_json('{"a":"barfoo"}'))
    g = parse('a $= "bar"')
    assert validate(g, decode_json('{"a":"foobar"}'))
    g = parse('a *= "oob"')
    assert validate(g, decode_json('{"a":"foobar"}'))
    g = parse('a ~= "^f.o"')
    assert validate(g, decode_json('{"a":"foobar"}'))
    g = parse('a *= []string{"en","de"}')
    assert validate(g, decode_json('{"a":"de"}'))
    assert not validate(g, decode_json('{"a":"fr"}'))
