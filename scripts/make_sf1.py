"""Synthesize an sf1-scale testdata directory from the driver's sf0.1.

Ten deterministic copies of each scaled table, with:
  - primary/foreign keys shifted per copy so referential integrity holds
    (orders.o_custkey -> customer, lineitem.l_orderkey -> orders);
  - document text perturbed per copy (appended copy token) so the
    near-dup structure is PRESERVED rather than multiplied — 10 exact
    clones of every doc would make the dedup queries super-linear for
    data reasons, not engine reasons;
  - embeddings perturbed by a small deterministic per-copy offset for the
    same reason (cosine very close to, but not exactly, 1.0 vs the
    source vector);
  - small dims (region/nation/supplier/part) copied as-is.

Usage: python scripts/make_sf1.py [out_dir]    (default /tmp/sf1)
Pure DuckDB; ~seconds.  Deterministic: same input -> same parquet values.
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10

# per-copy key shift, larger than any source key
SHIFT = 100_000_000

# columns rewritten per copy i; everything else passes through unchanged
REWRITES = {
    "c_custkey": "c_custkey + {i} * {S}",
    "o_orderkey": "o_orderkey + {i} * {S}",
    "o_custkey": "o_custkey + {i} * {S}",
    "l_orderkey": "l_orderkey + {i} * {S}",
    "event_id": "event_id + {i} * {S}",
    "user_id": "user_id + {i} * {S}",
    "doc_id": "doc_id + {i} * {S}",
    "vec_id": "vec_id + {i} * {S}",
    "text": "text || ' copytok{i}'",
    "n_chars": "n_chars + {nch}",
    "embedding": ("list_transform(embedding, "
                  "x -> CAST(x + 0.002 * {i} AS FLOAT))"),
}

SCALED = ("customer", "orders", "lineitem", "events", "documents",
          "embeddings")
COPIED = ("region", "nation", "supplier", "part")


def main(out="/tmp/sf1"):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPIED:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
    for t in SCALED:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        parts = []
        for i in range(COPIES):
            sel = ", ".join(
                (REWRITES[c].format(i=i, S=SHIFT,
                                    nch=len(f" copytok{i}"))
                 + f" AS {c}") if c in REWRITES else f'"{c}"'
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{SRC}/{t}.parquet'")
        sql = " UNION ALL ".join(parts)
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' "
                    "(FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    con.close()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
