"""katydid_haskell_spark — a PySpark-native schema + constraint validation engine.

Re-creates the *capability* of katydid/katydid-haskell (the Relapse tree
validation language, /root/reference) as a Spark-first engine:

- ``relapse/``   — the Relapse constraint language: parser, typed expression
  library, pattern algebra, Brzozowski-derivative compiler.  Specs are
  compiled on the driver into Catalyst ``Column`` trees (fast path) or a
  memoized derivative automaton evaluated in an Arrow-batched pandas UDF
  (dynamic-tree path).
- ``operators/`` — table-level constraint classes (stats, uniqueness,
  referential integrity, distribution drift) plus large-scale pipeline
  operators (dedup, similarity search, text analysis).
- ``sources/``   — deterministic synthetic `pages` corpus generator and
  testdata loaders.
- ``plans/``     — CheckPlan (rule suite) compilation + the runner emitting
  verdicts / violations DataFrames with resume support.
- ``streaming/`` — Structured Streaming validation.
"""

__version__ = "0.1.0"
