"""PII detection and redaction as pure Column expressions.

Every pattern is restricted to the Java-regex ∩ RE2 intersection (no
lookaround, explicit ASCII classes — same discipline as
``functions.text.BPE_SPLIT_PATTERN``), so Spark's ``regexp_replace`` /
``regexp_count`` and DuckDB's RE2 twins agree byte-for-byte and the
operators carry exact SQL oracles.

Redaction applies category patterns in a FIXED order (SSN before phone —
both are digit-group shapes and SSN's 3-2-4 must not be half-eaten by the
phone rule; email before IP so host-part digits aren't IP-matched). All
JVM-side regexp engine work: zero Python, zero shuffles, pipelines into
any scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (category, pattern, replacement) in application order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", r"[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
)


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its category tag, applying the
    category patterns in the fixed :data:`PII_PATTERNS` order."""
    out = text
    for _, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_count_col(text: Column, category: str) -> Column:
    """Number of matches of one PII category in ``text`` (counted on the
    RAW text, before any redaction reshapes it)."""
    for cat, pattern, _ in PII_PATTERNS:
        if cat == category:
            return F.regexp_count(text, F.lit(pattern)).cast("bigint")
    raise ValueError(
        f"unknown category {category!r}; known: {[c for c, _, _ in PII_PATTERNS]}"
    )


def duckdb_redact_sql(text_expr: str) -> str:
    """DuckDB expression applying the identical redaction chain.

    RE2 note: DuckDB regexp_replace replaces only the FIRST match unless
    the 'g' flag is passed — Spark replaces all, so 'g' is required.
    """
    out = text_expr
    for _, pattern, repl in PII_PATTERNS:
        escaped = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '{repl}', 'g')"
    return out


def duckdb_pii_count_sql(text_expr: str, category: str) -> str:
    """DuckDB expression counting one category's matches on raw text."""
    for cat, pattern, _ in PII_PATTERNS:
        if cat == category:
            escaped = pattern.replace("'", "''")
            return f"CAST(len(regexp_extract_all({text_expr}, '{escaped}')) AS BIGINT)"
    raise ValueError(f"unknown category {category!r}")
