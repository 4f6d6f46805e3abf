"""URL normalization and host extraction — JVM-side Column expressions
in the Java-regex ∩ RE2 dialect (no lookarounds, capture-group
replacements only), so every function has an exact DuckDB twin and the
whole layer stays in whole-stage codegen (crawl-scale URL handling must
never drop to Python).

Canonicalization is what URL-keyed curation needs (per-host caps via
``curation.cap_per_source``, URL-level exact dedup, frontier joins):

* lowercase the scheme and authority (path/query stay case-sensitive);
* strip the fragment (``#...`` never reaches the server);
* strip default ports (``:80`` for http, ``:443`` for https);
* strip a trailing ``?`` (empty query) and a lone trailing slash on a
  pathless URL.

Deliberately NOT done (needs a PSL or breaks semantics): registered-
domain extraction, percent-decoding, query-parameter sorting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scheme://authority prefix (group 1), used for the lowercase split
_PREFIX = "^([^:/?#]+://[^/?#]*)"

#: ordered (pattern, spark_replacement, duckdb_replacement) rewrites
#: applied AFTER the prefix lowercasing. Replacements use capture refs
#: ($1 in Java, \1 in RE2) — the only engine-syntax difference, handled
#: by keeping both spellings side by side.
URL_NORMALIZATION_STEPS: tuple[tuple[str, str, str], ...] = (
    # fragment never reaches the server
    ("#.*$", "", ""),
    # default ports (http :80, https :443) before a path/query or at end.
    # The authority class allows ':' so userinfo passwords survive; the
    # greedy match + required ':80' anchor still strips only a trailing
    # default port (':8080' cannot match — no [/?] or end after ':80').
    ("^(http://[^/?#]*):80([/?].*)?$", "$1$2", r"\1\2"),
    ("^(https://[^/?#]*):443([/?].*)?$", "$1$2", r"\1\2"),
    # empty query
    (r"\?$", "", ""),
    # lone trailing slash on a pathless URL
    ("^([^:/?#]+://[^/?#]+)/$", "$1", r"\1"),
)


def normalize_url_col(url: Column) -> Column:
    """Canonical URL as a pure Column expression (see module docstring).
    URLs without a scheme pass through the step chain unchanged by the
    prefix split (the extract is empty, so the original rides along)."""
    prefix = F.regexp_extract(url, _PREFIX, 1)
    rest = F.regexp_replace(url, _PREFIX, "")
    out = F.concat(F.lower(prefix), rest)
    for pat, spark_rep, _ in URL_NORMALIZATION_STEPS:
        out = F.regexp_replace(out, pat, spark_rep)
    return out


def duckdb_normalize_url_sql(expr: str) -> str:
    """The DuckDB expression computing the identical canonical URL."""
    out = (
        f"(lower(regexp_extract({expr}, '{_PREFIX}', 1)) || "
        f"regexp_replace({expr}, '{_PREFIX}', ''))"
    )
    for pat, _, duck_rep in URL_NORMALIZATION_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{duck_rep}')"
    return out


def host_col(url: Column) -> Column:
    """Lowercased hostname (no port, no userinfo) — the per-host
    cap/dedup key. Empty string for scheme-less input."""
    return F.lower(
        F.regexp_extract(url, "^[^:/?#]+://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    )


def duckdb_host_sql(expr: str) -> str:
    return (
        f"lower(regexp_extract({expr}, "
        "'^[^:/?#]+://(?:[^/@?#]*@)?([^/:?#]+)', 1))"
    )
