"""WARC/1.0 record framing — the container format web crawls actually
ship (ISO 28500), parsed for real.

A crawl WARC is a concatenation of records, each optionally its own
gzip member::

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: https://...\r\n
    Content-Length: N\r\n
    \r\n
    <N payload bytes>\r\n\r\n

``build_warc`` writes that layout deterministically (gzip mtime=0 —
the byte-identity discipline `warc_gzip` established);
``parse_warc_records`` walks it back with Content-Length framing,
case-insensitive headers, CRLF or bare-LF tolerance, and optional
gzip (single- or multi-member: stdlib ``gzip.decompress`` inflates a
member concatenation in one call).  Response records additionally get
their HTTP status line and headers split from the body.

Spark surface: :func:`warc_records` — one Arrow-batched mapInPandas
projection, one output row per record; payload bytes never shuffle.
"""

from __future__ import annotations

import gzip as _gzip
import hashlib
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


def build_warc(records: List[dict], compress: bool = True) -> bytes:
    """[{type, uri?, date?, body(bytes)}] → WARC bytes, one gzip member
    per record when ``compress`` (the CommonCrawl layout)."""
    out = bytearray()
    for rec in records:
        body = rec["body"]
        if isinstance(body, str):
            body = body.encode("utf-8")
        head = bytearray(b"WARC/1.0" + _CRLF)
        head += b"WARC-Type: " + rec["type"].encode("ascii") + _CRLF
        if rec.get("uri"):
            head += (b"WARC-Target-URI: " + rec["uri"].encode("utf-8")
                     + _CRLF)
        if rec.get("date"):
            head += b"WARC-Date: " + rec["date"].encode("ascii") + _CRLF
        head += b"Content-Length: " + str(len(body)).encode() + _CRLF
        head += _CRLF
        member = bytes(head) + body + _CRLF + _CRLF
        out += (_gzip.compress(member, mtime=0) if compress else member)
    return bytes(out)


def _parse_headers(block: bytes) -> Tuple[dict, int]:
    """Header block → ({lower_name: value}, end_offset_after_blank)."""
    headers: dict = {}
    pos = 0
    while True:
        eol = block.find(b"\n", pos)
        if eol < 0:
            raise ValueError("unterminated WARC header block")
        line = block[pos:eol].rstrip(b"\r")
        pos = eol + 1
        if not line:
            return headers, pos
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("utf-8", "replace"))


def parse_warc_records(payload: bytes) -> List[dict]:
    """WARC bytes (plain or gzip member concatenation) → list of
    {type, uri, date, content_length, body, http_status, http_headers,
    http_body} dicts in record order."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gzip.decompress(payload)
    records = []
    pos = 0
    n = len(payload)
    while pos < n:
        while pos < n and payload[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not payload[pos:pos + 5] == b"WARC/":
            raise ValueError(f"expected WARC/ version at offset {pos}")
        ver_end = payload.find(b"\n", pos)
        headers, hlen = _parse_headers(payload[ver_end + 1:])
        body_start = ver_end + 1 + hlen
        clen = int(headers.get("content-length", "0"))
        body = payload[body_start:body_start + clen]
        rec = {
            "type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "content_length": clen,
            "body": body,
            "http_status": None,
            "http_headers": None,
            "http_body": None,
        }
        if rec["type"] == "response" and body[:5] == b"HTTP/":
            line_end = body.find(b"\n")
            status_line = body[:line_end].rstrip(b"\r").decode(
                "latin-1", "replace")
            parts = status_line.split(" ", 2)
            if len(parts) >= 2 and parts[1].isdigit():
                rec["http_status"] = int(parts[1])
            hh, hend = _parse_headers(body[line_end + 1:])
            rec["http_headers"] = hh
            rec["http_body"] = body[line_end + 1 + hend:]
        records.append(rec)
        pos = body_start + clen
    return records


def warc_records(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, payload: binary WARC) → one row per record through the REAL
    parser, Arrow-batched: (doc_id, record_idx, warc_type, target_uri,
    content_length, http_status, n_http_headers, body_len, body_md5).
    Sentinels keep every column non-null for the value-hash gate:
    target_uri '' when absent, http_status/n_http_headers -1 for
    non-HTTP records."""
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("record_idx", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("http_status", T.LongType()),
        T.StructField("n_http_headers", T.LongType()),
        T.StructField("body_len", T.LongType()),
        T.StructField("body_md5", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for did, p in zip(b[id_col], b[payload_col]):
                for i, rec in enumerate(parse_warc_records(bytes(p))):
                    payload_body = (rec["http_body"]
                                    if rec["http_body"] is not None
                                    else rec["body"])
                    rows.append((
                        int(did), i, rec["type"], rec["uri"] or "",
                        rec["content_length"],
                        rec["http_status"]
                        if rec["http_status"] is not None else -1,
                        len(rec["http_headers"])
                        if rec["http_headers"] is not None else -1,
                        len(payload_body),
                        hashlib.md5(payload_body).hexdigest(),
                    ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "record_idx", "warc_type", "target_uri",
                "content_length", "http_status", "n_http_headers",
                "body_len", "body_md5"])

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)
