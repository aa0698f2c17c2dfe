"""Cross-algorithm check: Catalyst lowering vs pure derivative engine vs
automaton UDF — the analogue of the reference's 4-algorithm golden-corpus
cross-check (/root/reference/test/Suite.hs:46-61).

Every fixture (spec, rows) is evaluated by:
  1. the pure-Python memoized derivative engine over row→forest encoding;
  2. the compile-time-unrolled Catalyst Column (lower.compile_to_column);
  3. (JSON fixtures) the automaton pandas UDF over a JSON string column.
All must agree exactly.
"""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from katydid_haskell_spark.relapse.automaton import validate_json_column
from katydid_haskell_spark.relapse.derive import Validator
from katydid_haskell_spark.relapse.labels import decode_json
from katydid_haskell_spark.relapse.lower import compile_to_column
from katydid_haskell_spark.relapse.parser import parse_grammar
from katydid_haskell_spark.relapse.rows import row_to_forest
from katydid_haskell_spark.relapse.smart import compile_grammar

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("author", T.StringType()),
                    T.StructField("year", T.LongType()),
                ]
            ),
        ),
    ]
)

ROWS = [
    {"url": "https://a.example/x", "lang": "en", "n": 3, "score": 0.5,
     "flag": True, "tags": ["web", "news"], "meta": {"author": "ann", "year": 2020}},
    {"url": "http://b.example/y", "lang": "de", "n": 0, "score": -1.0,
     "flag": False, "tags": [], "meta": {"author": "bob", "year": 1999}},
    {"url": None, "lang": "xx", "n": None, "score": None, "flag": None,
     "tags": None, "meta": None},
    {"url": "https://c.example/z", "lang": None, "n": 42, "score": 3.14,
     "flag": True, "tags": ["a"], "meta": {"author": None, "year": None}},
    {"url": "ftp://d.example", "lang": "fr", "n": -7, "score": 0.0,
     "flag": False, "tags": ["x", "y", "z"], "meta": {"author": "cid", "year": 2024}},
]

# spec → exercises (FIXTURES.md §4 operator families)
SPECS = [
    '.lang == "en"',                               # leaf eq + contains
    '.n == 3',                                     # int eq
    '.n: >= 0',                                    # ordered compare
    '.score: -> gt($double, double(0.0))',         # function call form
    '.url ^= "https://"',                          # hasPrefix
    '.url $= "/x"',                                # hasSuffix
    '.url *= "example"',                           # substring
    '.url ~= "^https?://[a-z.]+/"',                # regex
    '(.lang == "en" | .lang == "de")',             # or
    '(.url ^= "http" & .lang == "en")',            # and
    '!(.lang == "xx")',                            # not
    '.lang *= []string{"en","de","fr"}',           # list membership
    '.lang :: $string',                            # type check
    '.flag == true',                               # bool eq
    '.n: -> not(eq($int, 0))',                     # not + error-as-false
    '.tags: <empty>',                              # empty array
    '.tags: (_:== "web")*',                        # forall over array (fails if any non-web)
    '.tags: ._:== "news"',                         # exists over array
    '.tags: [_:== "web", _:== "news"]',            # fixed concat over array
    '.meta: {author: == "ann"; year: *}',          # struct interleave
    '.meta: .author == "bob"',                     # struct contains
    '{url: *; lang: == "en"; n: *; score: *; flag: *; tags: *; meta: *}',
    '[url: *, lang: *, n: *, score: *, flag: *, tags: *, meta: *]',
    '(.n: > 1 & .n: < 100)',
    '*',                                           # zany
    '!(*)',                                        # empty set
    '(.lang == "en")?',                            # optional at top
    '#main = @langok #langok = .lang *= []string{"en","de","fr"}',  # refs
]


def python_verdicts(spec):
    g = compile_grammar(parse_grammar(spec))
    v = Validator(g)
    return [v.validate(row_to_forest(r, SCHEMA)) for r in ROWS]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [tuple(r[f.name] for f in SCHEMA.fields) if isinstance(r, dict) else r
         for r in [
             {**row, "meta": tuple(row["meta"].values()) if row["meta"] else None}
             for row in ROWS
         ]],
        SCHEMA,
    ).cache()


@pytest.mark.parametrize("spec", SPECS)
def test_catalyst_matches_derivative(spark, df, spec):
    want = python_verdicts(spec)
    g = compile_grammar(parse_grammar(spec))
    col = compile_to_column(g, SCHEMA)
    got = [r["m"] for r in df.select(col.alias("m")).collect()]
    assert got == want, f"spec={spec}\nwant={want}\ngot={got}"


JSON_SPECS = [
    '(a|b): == 1',  # name-choice treenode (beyond the reference grammar)
    'a == 1',
    '(a == 1 | b == "x")',
    '.c == 2',
    'items: [0:== 1, 1:== 2]',
    'p:{x: *; y: == 5}',
    '(k: (_:*)*)?',
]

JSON_DOCS = [
    '{"a":1}',
    '{"b":"x"}',
    '{"a":2,"c":2}',
    '{"items":[1,2]}',
    '{"items":[1,3]}',
    '{"p":{"x":9,"y":5}}',
    '{"p":{"y":5,"x":9}}',
    '{"k":[1,2,3]}',
    "{}",
    "[1,2]",
]


@pytest.mark.parametrize("spec", JSON_SPECS)
def test_automaton_udf_matches_derivative(spark, spec):
    g = compile_grammar(parse_grammar(spec))
    v = Validator(g)
    want = [v.validate(decode_json(d)) for d in JSON_DOCS]
    sdf = spark.createDataFrame([(d,) for d in JSON_DOCS], "doc string")
    got = [
        r["m"]
        for r in sdf.select(validate_json_column(F.col("doc"), spec).alias("m")).collect()
    ]
    assert got == want, f"spec={spec}\nwant={want}\ngot={got}"


def test_applicative_or_error_propagation(spark):
    """ADVICE r1 (high): or/and are applicative over eval errors
    (Logic.hs orExpr'/defaultAnd: `(||) <$> eval a v <*> eval b v`) —
    `or(True, <type error>)` must be error -> node root False, never True.
    All three paths must agree on a predicate mixing variable types."""
    spec = 'n: -> or(eq($int, 5), hasPrefix($string, "x"))'
    g = compile_grammar(parse_grammar(spec))
    rows = [{"url": None, "lang": None, "n": 5, "score": None, "flag": None,
             "tags": None, "meta": None},
            {"url": None, "lang": None, "n": 7, "score": None, "flag": None,
             "tags": None, "meta": None}]
    v = Validator(g)
    pure = [v.validate(row_to_forest(r, SCHEMA)) for r in rows]
    # $string on a long field is an eval error; applicative or propagates it
    # even though eq($int, 5) is True on the first row.
    assert pure == [False, False]
    sdf = spark.createDataFrame(
        [tuple(r[f.name] for f in SCHEMA.fields) for r in rows], SCHEMA)
    lowered = [r["m"] for r in
               sdf.select(compile_to_column(g, SCHEMA).alias("m")).collect()]
    assert lowered == pure
    docs = ['{"n": 5}', '{"n": 7}']
    want_json = [v.validate(decode_json(d)) for d in docs]
    jdf = spark.createDataFrame([(d,) for d in docs], "doc string")
    auto = [r["m"] for r in
            jdf.select(validate_json_column(F.col("doc"), spec).alias("m")).collect()]
    assert auto == want_json == [False, False]


def test_timestamp_ntz_lowers_as_epoch_int(spark):
    """TIMESTAMP and TIMESTAMP_NTZ columns both expose as $int epoch
    seconds in the lowering AND the row-to-forest engine path (parquet
    event tables carry NTZ; round 5)."""
    import datetime as dt

    from pyspark.sql import types as T

    from katydid_haskell_spark.relapse.rows import row_to_forest

    spec = ".ts >= 1000000000"
    g = compile_grammar(parse_grammar(spec))
    for ts_type in (T.TimestampType(), T.TimestampNTZType()):
        schema = T.StructType([T.StructField("ts", ts_type)])
        rows = [(dt.datetime(2010, 1, 1),), (dt.datetime(1980, 1, 1),),
                (None,)]
        sdf = spark.createDataFrame(rows, schema)
        lowered = [r["m"] for r in sdf.select(
            compile_to_column(g, schema).alias("m")).collect()]
        pure = [Validator(g).validate(
            row_to_forest({"ts": r[0]}, schema)) for r in rows]
        assert lowered == pure == [True, False, False], ts_type
