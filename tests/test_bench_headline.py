"""The bench's FINAL stdout line must fit the driver's 2000-byte tail.

BENCH_r06 came back ``parsed: null`` because the single headline JSON line
carried 70 per-query timings (~2.4 KB) and the driver keeps only the last
2000 bytes of stdout — the line's head (``"metric"``/``"value"``) was
truncated away.  ``bench.compact_headline`` is the structural fix: the
per-query map goes out on an earlier line + BENCH/LAST_FULL.json, and the
final line is the compact record tested here.  No Spark needed.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _fake_out(n_queries: int) -> dict:
    return {
        "metric": "headline_total_sec",
        "value": 123.456,
        "unit": "sec",
        "queries": {f"some_rather_long_query_name_{i:04d}": 1.234
                    for i in range(n_queries)},
        "sf": 0.1,
        "pages_docs_per_sec": 213800,
        "pages_rows": 1_000_000,
        "unique_json_docs_per_sec": 510000,
        "unique_json_rows": 1_000_000,
        "ambient_load1": 6.24,
    }


def test_compact_headline_drops_queries_and_fits_tail():
    out = _fake_out(70)  # the exact count that broke BENCH_r06
    c = bench.compact_headline(out)
    line = json.dumps(c)
    assert "queries" not in c
    assert len(line) < 1500, f"final stdout line too long: {len(line)}"
    # the driver's parser needs these intact at the line's head
    assert c["metric"] == "headline_total_sec"
    assert c["value"] == 123.456
    assert c["unit"] == "sec"
    assert c["sf"] == 0.1
    assert c["n_queries"] == 70
    assert c["per_query_file"] == "BENCH/LAST_FULL.json"


def test_compact_headline_survives_query_count_growth():
    # even at 500 queries the FINAL line must not grow: the map is gone
    small = json.dumps(bench.compact_headline(_fake_out(70)))
    big = json.dumps(bench.compact_headline(_fake_out(500)))
    assert len(big) == len(small) + 1  # only the n_queries digits differ
    assert len(big) < 1500
