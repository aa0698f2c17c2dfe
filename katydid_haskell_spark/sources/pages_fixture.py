"""Spark-free pages fixture for the DuckDB oracle.

``_gen_batch`` (sources/pages.py) is a pure function of (seed, id) —
partition-invariant by contract (the byte-identity invariant depends on
it) — so the exact rows Spark produces via mapInPandas can be regenerated
here with plain pandas + pyarrow and handed to DuckDB as parquet.  The
``bucket`` column uses the pure-Python xxh64 (verified against Spark's
``F.xxhash64`` bit-for-bit).

Fixture writes are idempotent and keyed by (n, seed, buckets, drifted) in
the filename; both ``queries()`` and ``oracle_sql()`` call ensure_* so the
driver's execution order doesn't matter.
"""

from __future__ import annotations

import os

import numpy as np

from .pages import DEFAULT_BUCKETS, SEED, _gen_batch
from .xxh64 import spark_string_bucket

FIXTURE_DIR = "/tmp/katydid_oracle_fixtures"


def pages_fixture_path(n_rows: int, seed: int = SEED,
                       buckets: int = DEFAULT_BUCKETS,
                       drifted: bool = True,
                       out_dir: str = FIXTURE_DIR) -> str:
    tag = "drift" if drifted else "base"
    return os.path.join(out_dir, f"pages_{n_rows}_{seed}_{buckets}_{tag}.parquet")


def ensure_pages_fixture(n_rows: int, seed: int = SEED,
                         buckets: int = DEFAULT_BUCKETS,
                         drifted: bool = True,
                         out_dir: str = FIXTURE_DIR) -> str:
    """Write (once) and return the parquet path for the deterministic pages
    corpus.  Drops the html payload — the oracle SQL only consumes
    url/warc_ts/text/lang/bucket."""
    path = pages_fixture_path(n_rows, seed, buckets, drifted, out_dir)
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    pdf = _gen_batch(np.arange(n_rows, dtype=np.uint64), seed, drifted)
    pdf = pdf.drop(columns=["html"])
    pdf["bucket"] = np.array(
        [spark_string_bucket(u, buckets) for u in pdf["url"]], dtype=np.int32
    )
    tmp = f"{path}.tmp.{os.getpid()}"  # unique per writer; replace is atomic
    pdf.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path
