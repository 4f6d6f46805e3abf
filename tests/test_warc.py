"""sources/warc: record parsing, binary-safety, leniency on broken
archives. q97 covers the full WARC -> HTML -> text path vs the oracle."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from elephantdb_spark.sources.warc import (
    build_warc,
    http_body,
    parse_warc,
    warc_records_df,
)


def _resp(uri: str, body: bytes, headers: bool = True) -> dict:
    block = (b"HTTP/1.1 200 OK\r\nX: y\r\n\r\n" + body) if headers else body
    return {"warc_type": "response", "target_uri": uri, "block": block}


class TestParse:
    def test_roundtrip_and_http_strip(self):
        recs = [
            {"warc_type": "warcinfo", "block": b"software: t\r\n"},
            _resp("http://a/1", b"<p>one</p>"),
            _resp("http://a/2", b"raw body no headers", headers=False),
        ]
        out = parse_warc(build_warc(recs))
        assert [r["warc_type"] for r in out] == ["warcinfo", "response", "response"]
        assert out[1]["target_uri"] == "http://a/1"
        assert http_body(out[1]["block"]) == b"<p>one</p>"
        assert http_body(out[2]["block"]) == b"raw body no headers"

    def test_blocks_are_binary_safe(self):
        # CRLF-CRLF *inside* a block must not split records: parsing is
        # Content-Length-driven
        nasty = b"WARC/1.0\r\n\r\nlooks like a record\r\n\r\n" * 2
        out = parse_warc(build_warc([{"warc_type": "resource", "block": nasty}]))
        assert len(out) == 1 and out[0]["block"] == nasty

    def test_empty_and_malformed(self):
        assert parse_warc(b"") == []
        import pytest

        for bad in (
            b"nonsense",
            b"WARC/1.0\r\nNoColonHere\r\n\r\n",
            b"WARC/1.0\r\nContent-Length: 10\r\n\r\nshort",
            b"WARC/1.0\r\nContent-Length: x\r\n\r\n",
            b"WARC/1.0\r\nContent-Length: 1",
        ):
            with pytest.raises(ValueError):
                parse_warc(bad)


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_parse_garbage_raises_cleanly_or_parses(data):
    try:
        parse_warc(data)
    except ValueError:
        pass


@given(st.lists(st.binary(max_size=120), max_size=5),
       st.booleans())
@settings(max_examples=100, deadline=None)
def test_build_parse_roundtrip_arbitrary_blocks(blocks, with_uri):
    recs = [
        {
            "warc_type": "resource",
            "target_uri": f"http://x/{i}" if with_uri else None,
            "block": b,
        }
        for i, b in enumerate(blocks)
    ]
    out = parse_warc(build_warc(recs))
    assert [r["block"] for r in out] == blocks


def test_spark_record_explode_skips_broken_archives(spark):
    good = build_warc(
        [{"warc_type": "warcinfo", "block": b"i\r\n"},
         _resp("http://a/1", b"bodyA"), _resp("http://a/2", b"bodyB")]
    )
    rows = [(1, good), (2, b"corrupt archive bytes"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, warc binary")
    got = warc_records_df(df, "doc_id", "warc").collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["id"], []).append(r)
    # archive 1: only the two response records, http-stripped, idx 0/1
    assert sorted((r["rec_idx"], bytes(r["body"])) for r in by_id[1]) == [
        (0, b"bodyA"), (1, b"bodyB"),
    ]
    assert {r["target_uri"] for r in by_id[1]} == {"http://a/1", "http://a/2"}
    # broken/NULL archives contribute zero rows, no task failure
    assert 2 not in by_id and 3 not in by_id


class TestGzip:
    def test_member_per_record_gzip(self):
        """Common Crawl layout: one gzip member PER record — a naive
        single-member gunzip would silently drop all but the first."""
        import gzip as _gz

        from elephantdb_spark.sources.warc import gunzip_members

        recs = [_resp(f"http://a/{i}", f"body{i}".encode()) for i in range(3)]
        members = b"".join(_gz.compress(build_warc([r])) for r in recs)
        out = parse_warc(members)  # transparent decompression
        assert [r["target_uri"] for r in out] == [f"http://a/{i}" for i in range(3)]
        assert gunzip_members(members) == b"".join(build_warc([r]) for r in recs)

    def test_single_member_and_garbage(self):
        import gzip as _gz

        import pytest

        from elephantdb_spark.sources.warc import gunzip_members

        whole = build_warc([_resp("http://a/1", b"x")])
        assert parse_warc(_gz.compress(whole)) == parse_warc(whole)
        for bad in (b"\x1f\x8bgarbage", _gz.compress(b"x")[:-4],
                    _gz.compress(b"x") + b"trailing"):
            with pytest.raises(ValueError):
                gunzip_members(bad)


class TestReviewFixes:
    def test_negative_content_length_rejected_not_looped(self):
        """A negative Content-Length must raise, not rewind the cursor
        into an infinite record loop (review finding, r4)."""
        import pytest

        with pytest.raises(ValueError, match="negative Content-Length"):
            parse_warc(b"WARC/1.0\r\nContent-Length: -33\r\n\r\n")

    def test_build_warc_roundtrips_none_warc_type(self):
        raw = (b"WARC/1.0\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n")
        recs = parse_warc(raw)
        assert recs[0]["warc_type"] is None
        again = parse_warc(build_warc(recs))  # must not raise
        assert again[0]["block"] == b"abc"

    def test_gunzip_many_members_linear(self):
        """200 members decompress fast and correctly (the bounded-chunk
        offset walk; the old whole-remainder refeed was quadratic)."""
        import gzip as _gz
        import time

        from elephantdb_spark.sources.warc import gunzip_members

        members = [build_warc([_resp(f"http://a/{i}", b"b" * 50)]) for i in range(200)]
        blob = b"".join(_gz.compress(m) for m in members)
        t0 = time.perf_counter()
        out = gunzip_members(blob)
        assert out == b"".join(members)
        assert len(parse_warc(blob)) == 200
        assert time.perf_counter() - t0 < 5.0
