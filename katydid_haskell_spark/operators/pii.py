"""PII detection and redaction for corpus curation (C4 / Dolma-style
anonymization).

Everything is JVM-side Catalyst regex (``regexp_count`` /
``regexp_replace`` — whole-stage codegen, no UDF, no shuffle): the
100-TB shape is a pure map-side pass.  The patterns stay inside the
Java-regex / RE2 common subset (no lookaround, no backrefs) so the
DuckDB oracle scans with the identical semantics.

Redaction order is load-bearing and mirrored in the SQL oracle: emails
first (their local part would otherwise be eaten by the id rule), then
IPv4 (dotted digit runs would match phone/id), then phones, then bare
long digit ids.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java-regex / RE2 common subset only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{10,14}\b"
LONG_ID_RE = r"\b[0-9]{9,}\b"

_RULES = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("long_id", LONG_ID_RE, "<ID>"),
]


def pii_counts(col: Column) -> Column:
    """Struct of per-document PII match counts (n_email, n_ipv4,
    n_phone, n_long_id), counted on the RAW text (before redaction)."""
    return F.struct(
        *[F.regexp_count(col, F.lit(pat)).alias(f"n_{name}")
          for name, pat, _ in _RULES]
    )


def redact(col: Column) -> Column:
    """Text with every PII span replaced by its placeholder, applying
    the rules in the fixed documented order."""
    out = col
    for _, pat, repl in _RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scan(df, id_col: str, text_col: str):
    """(id, n_email, n_ipv4, n_phone, n_long_id, any_pii,
    redacted_fp) — counts plus an md5 fingerprint of the redacted text
    (compact equality evidence without shipping the full redaction)."""
    counts = pii_counts(F.col(text_col))
    fields = [counts.getField(f"n_{name}").alias(f"n_{name}")
              for name, _, _ in _RULES]
    any_pii = None
    for name, _, _ in _RULES:
        c = counts.getField(f"n_{name}") > 0
        any_pii = c if any_pii is None else (any_pii | c)
    return df.select(
        id_col,
        *fields,
        any_pii.alias("any_pii"),
        F.md5(redact(F.col(text_col))).alias("redacted_fp"),
    )
