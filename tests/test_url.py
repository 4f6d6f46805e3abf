"""functions/url: canonicalization semantics + 3-way Spark/DuckDB parity
on a messy-URL corpus (the twins must agree byte-for-byte — any pattern
edit needs this re-run). q98 covers the driver-scale comparison."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from elephantdb_spark.functions.url import (
    duckdb_host_sql,
    duckdb_normalize_url_sql,
    host_col,
    normalize_url_col,
)

CASES = {
    "HTTP://Example.COM:80/Path?q=1#frag": ("http://example.com/Path?q=1", "example.com"),
    "https://Site.org:443/": ("https://site.org", "site.org"),
    "https://site.org:8443/x": ("https://site.org:8443/x", "site.org"),
    "http://User:Pw@Host.Net:80": ("http://user:pw@host.net", "host.net"),
    "HTTP://A.B/": ("http://a.b", "a.b"),
    "http://a.b/deep/path/": ("http://a.b/deep/path/", "a.b"),
    "http://a.b?": ("http://a.b", "a.b"),
    "http://a.b?#f": ("http://a.b", "a.b"),
    "ftp://Files.example.com/pub": ("ftp://files.example.com/pub", "files.example.com"),
    "no-scheme/just/path": ("no-scheme/just/path", ""),
    "": ("", ""),
    "http://a.b/CaseSensitive/PATH?Q=Mixed": (
        "http://a.b/CaseSensitive/PATH?Q=Mixed", "a.b"),
}


def test_handcrafted_semantics(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(CASES)], "i long, url string"
    )
    rows = df.select(
        "i",
        normalize_url_col(F.col("url")).alias("n"),
        host_col(F.col("url")).alias("h"),
    ).collect()
    for r, (url, (want_n, want_h)) in zip(sorted(rows, key=lambda r: r["i"]),
                                          CASES.items()):
        assert r["n"] == want_n, (url, r["n"], want_n)
        assert r["h"] == want_h, (url, r["h"], want_h)


def test_three_way_duckdb_parity(spark):
    urls = list(CASES) + [
        "HTTPS://X.Y:443",         # default port at end, no path
        "http://x.y:80?q",         # port then query
        "http://x.y:80#f",         # port then fragment
        "HtTp://MiXeD.CaSe/Path",  # scheme case soup
        "http://h/p1/p2?a=B#c#d",  # multiple '#'
        "http://h:8080/",          # non-default port keeps trailing rule?
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    got = {
        r["i"]: (r["n"], r["h"])
        for r in df.select(
            "i",
            normalize_url_col(F.col("url")).alias("n"),
            host_col(F.col("url")).alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    for i, u in enumerate(urls):
        n, h = con.execute(
            f"SELECT {duckdb_normalize_url_sql('url')}, {duckdb_host_sql('url')} "
            "FROM (SELECT ? AS url)",
            [u],
        ).fetchone()
        assert got[i] == (n, h), (u, got[i], (n, h))
