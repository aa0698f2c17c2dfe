"""Automaton path: vectorized derivative validation for dynamic trees.

When a spec's shape cannot be unrolled against a fixed schema (regular
expressions over unbounded dynamic children — SURVEY.md §7.3), it runs as a
memoized derivative automaton inside an Arrow-batched pandas UDF.  This is
the only place the reference engine's *shape* survives, as the north star
requires: state = canonical pattern set, transitions built lazily and cached
(the ``MemDerive.hs:41-81`` / ``VpaDerive.hs:39-106`` lazy VPA), shared
across all rows an executor core processes.

The grammar travels to executors as its *source text* (small, picklable);
each executor compiles it once per spec (cached by source) — the moral
equivalent of broadcasting the transition table, with the table itself built
on first use and amortized across the partition, exactly like the
reference's shared ``State Mem`` across trees (``Relapse.hs:65-70``).
"""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .derive import Validator
from .labels import decode_json
from .parser import parse_grammar
from .smart import compile_grammar

# per-process (executor) cache: spec source → Validator with warm memo tables
_VALIDATORS: dict = {}


def _validator_for(source: str, user_lib=None) -> Validator:
    key = (source, id(user_lib) if user_lib else None)
    v = _VALIDATORS.get(key)
    if v is None:
        v = Validator(compile_grammar(parse_grammar(source, user_lib)))
        _VALIDATORS[key] = v
    return v


def json_matches_udf(spec_source: str, user_lib=None) -> Callable[[Column], Column]:
    """A vectorized (Arrow) boolean UDF: does each JSON document match.

    Compiles the spec on the driver first (fail fast), ships only the
    source.  NULL/invalid JSON → False (error-as-false at document level).
    """
    # driver-side compile: surface spec errors before the job runs
    compile_grammar(parse_grammar(spec_source, user_lib))

    @pandas_udf("boolean")
    def match(docs: pd.Series) -> pd.Series:
        v = _validator_for(spec_source, user_lib)

        def one(doc: Optional[str]) -> bool:
            if doc is None:
                return False
            try:
                forest = decode_json(doc)
            except Exception:
                return False
            return v.validate(forest)

        return docs.map(one)

    return match


def validate_json_column(col: Column, spec_source: str, user_lib=None) -> Column:
    """Boolean Column: JSON document column matches the Relapse spec."""
    return json_matches_udf(spec_source, user_lib)(col)
