"""WARC (Web ARChive, ISO 28500-ish) record parsing — the Common Crawl
ingestion format, pure stdlib.

A WARC file is a concatenation of records::

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: http://...\r\n
    Content-Length: N\r\n
    \r\n
    <N bytes of block>\r\n
    \r\n

For ``response`` records the block is an HTTP message; ``http_body``
additionally strips the HTTP header section (everything through the
first blank line). Parsing is length-driven (Content-Length), never
delimiter-scanning inside blocks, so binary payloads survive intact.
Malformed input raises ``ValueError`` (one failure type, fuzz-held);
the Spark surface (:func:`warc_records_df`) maps broken archives to
zero rows instead of failing the task, and is a rowwise Arrow-batched
``mapInPandas`` explode — the crawl-archive front of the ingest
pipeline, composing with ``operators/html.extract_html_text`` and the
curation stages downstream.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame

_CRLF = b"\r\n"

_GZIP_MAGIC = b"\x1f\x8b"


def gunzip_members(payload: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream — the Common
    Crawl ``.warc.gz`` shape is one gzip member PER RECORD, concatenated,
    so a plain single-member gunzip silently drops everything after the
    first record. Pure stdlib zlib; malformed streams raise ValueError.

    Members are fed in bounded chunks against a byte offset (never the
    whole residual buffer), so cost is O(archive bytes) — re-feeding the
    remainder per member would be O(members x size), hours on a real
    50k-record Common Crawl file."""
    out = bytearray()
    mv = memoryview(payload)
    pos = 0
    chunk_size = 1 << 16
    while pos < len(mv):
        if bytes(mv[pos:pos + 2]) != _GZIP_MAGIC:
            raise ValueError("trailing non-gzip bytes after gzip members")
        d = zlib.decompressobj(wbits=31)
        try:
            while not d.eof:
                if pos >= len(mv):
                    raise ValueError("truncated gzip member")
                chunk = bytes(mv[pos:pos + chunk_size])
                out += d.decompress(chunk)
                pos += len(chunk)
        except zlib.error as exc:
            raise ValueError(f"bad gzip member: {exc}") from exc
        # rewind to the start of the next member (unused bytes are within
        # the last bounded chunk, so this is O(chunk), not O(file))
        pos -= len(d.unused_data)
    return bytes(out)


def parse_warc(payload: bytes) -> list[dict]:
    """Parse a WARC byte string into records:
    ``{"warc_type", "target_uri", "date", "content_length", "block"}``.
    Unknown headers are ignored; record order is preserved. Gzipped
    archives (``.warc.gz``, incl. the member-per-record Common Crawl
    layout) are transparently decompressed."""
    if not payload:
        return []
    if payload[:2] == _GZIP_MAGIC:
        payload = gunzip_members(payload)
    records: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        # skip inter-record blank lines
        while payload.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        end_hdr = payload.find(_CRLF + _CRLF, pos)
        if end_hdr < 0:
            raise ValueError("truncated WARC header block")
        header_lines = payload[pos:end_hdr].split(_CRLF)
        if not header_lines or not header_lines[0].startswith(b"WARC/"):
            raise ValueError("record does not start with a WARC/ version line")
        fields: dict[str, str] = {}
        for line in header_lines[1:]:
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            fields[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(fields.get("content-length", ""))
        except ValueError as exc:
            raise ValueError("missing/invalid Content-Length") from exc
        if length < 0:
            # a negative length would move the cursor BACKWARDS and loop
            # the parser forever on hostile archives
            raise ValueError(f"negative Content-Length {length}")
        body_start = end_hdr + 4
        if body_start + length > n:
            raise ValueError("WARC block extends past end of payload")
        records.append(
            {
                "warc_type": fields.get("warc-type"),
                "target_uri": fields.get("warc-target-uri"),
                "date": fields.get("warc-date"),
                "content_length": length,
                "block": payload[body_start:body_start + length],
            }
        )
        pos = body_start + length
    return records


def http_body(block: bytes) -> bytes:
    """Strip the HTTP header section of a response block (through the
    first CRLF-CRLF); a block without one is returned whole (already
    headerless captures exist in the wild)."""
    sep = block.find(_CRLF + _CRLF)
    return block if sep < 0 else block[sep + 4:]


def build_warc(records: list[dict]) -> bytes:
    """Serialize records (dicts with ``warc_type``/``target_uri``/
    ``date``/``block``) back to WARC bytes — the fixture generator for
    driving the parse path (q97, tests) without crawl files."""
    out = bytearray()
    for rec in records:
        block = rec.get("block", b"")
        out += b"WARC/1.0" + _CRLF
        # `or` (not a dict default): parse_warc emits warc_type=None for
        # records without the header, and the round-trip must survive it
        out += b"WARC-Type: " + (rec.get("warc_type") or "resource").encode() + _CRLF
        if rec.get("target_uri"):
            out += b"WARC-Target-URI: " + rec["target_uri"].encode() + _CRLF
        if rec.get("date"):
            out += b"WARC-Date: " + rec["date"].encode() + _CRLF
        out += b"Content-Length: " + str(len(block)).encode() + _CRLF
        out += _CRLF + bytes(block) + _CRLF + _CRLF
    return bytes(out)


def warc_records_df(
    df: DataFrame,
    id_col: str,
    warc_col: str,
    strip_http: bool = True,
    types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Explode WARC archive payloads into one row per record of the
    requested types (``rec_idx`` counts kept records per archive;
    ``body`` is the block, HTTP headers stripped when ``strip_http``).
    Malformed archives yield zero rows — a 100 TB crawl always contains
    broken members, and one must not fail the task."""
    import pandas as pd

    cols = df.select(id_col, warc_col)
    keep = set(types) if types else None
    # id type follows id_col (crawl doc ids are often strings; a fixed
    # `long` would fail the task with an opaque Arrow cast error)
    schema = (
        f"id {dict(df.dtypes)[id_col]}, rec_idx int, warc_type string, "
        "target_uri string, body binary"
    )

    def explode(batches):
        for pdf in batches:
            ids, idxs, wtypes, uris, bodies = [], [], [], [], []
            for _id, payload in zip(pdf[id_col], pdf[warc_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    recs = parse_warc(data)
                except ValueError:
                    continue
                k = 0
                for rec in recs:
                    if keep is not None and rec["warc_type"] not in keep:
                        continue
                    body = rec["block"]
                    if strip_http:
                        body = http_body(body)
                    ids.append(_id)
                    idxs.append(k)
                    wtypes.append(rec["warc_type"])
                    uris.append(rec["target_uri"])
                    bodies.append(body)
                    k += 1
            yield pd.DataFrame(
                {
                    "id": ids,
                    "rec_idx": pd.Series(idxs, dtype="int32"),
                    "warc_type": wtypes,
                    "target_uri": uris,
                    "body": bodies,
                }
            )

    return cols.mapInPandas(explode, schema)
