"""Regression tests for the round-4 ADVICE findings (low-severity review
items): intra-batch duplicate ids in update_ivf_index, truncated v1 mvhd
boxes, non-long id columns through the WARC/HTML mapInPandas stages, and
the hierarchical IVF trainer's centroid-budget overflow."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --- ADVICE 1: update_ivf_index intra-batch duplicate ids ----------------


def test_update_ivf_index_rejects_intra_batch_dup_ids(spark, tmp_path):
    from elephantdb_spark.operators.ann_index import (
        build_ivf_index,
        update_ivf_index,
    )

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    root = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, root, n_cells=4, version=1)
    one = emb.limit(1)
    batch = one.unionByName(one)  # same vec_id twice
    with pytest.raises(ValueError, match="duplicate id"):
        update_ivf_index(spark, batch, root, version=2)
    # a clean batch still goes through after the rejected one
    v = update_ivf_index(spark, one, root, version=3)
    assert v == 3


# --- ADVICE 2: truncated v1 mvhd must raise, not read sibling bytes ------


def test_decode_mp4_truncated_v1_mvhd_raises():
    import struct

    from elephantdb_spark.operators.multimodal import decode_mp4, synth_mp4

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    # v1 mvhd with only 20 body bytes (enough for the old guard, not for
    # the 32 bytes a v1 box needs) followed by a sibling box whose bytes
    # the old code would silently unpack as timescale/duration
    mvhd = box(b"mvhd", struct.pack(">BxxxIIII", 1, 0, 0, 7, 9))
    sibling = box(b"free", b"\xff" * 24)
    payload = box(b"ftyp", b"isom\x00\x00\x02\x00isom") + box(
        b"moov", mvhd + sibling
    )
    with pytest.raises(ValueError, match="truncated mvhd v1"):
        decode_mp4(payload)
    # a well-formed v0 fixture still decodes
    info = decode_mp4(synth_mp4(9000, 320, 240))
    assert info["duration_ms"] == 9000


def test_decode_mp4_truncated_v0_mvhd_raises():
    import struct

    from elephantdb_spark.operators.multimodal import decode_mp4

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd = box(b"mvhd", struct.pack(">BxxxII", 0, 0, 0))  # 12 < 20 bytes
    payload = box(b"ftyp", b"isom\x00\x00\x02\x00isom") + box(b"moov", mvhd)
    with pytest.raises(ValueError, match="truncated mvhd v0"):
        decode_mp4(payload)


# --- ADVICE 3: string id columns through WARC/HTML stages ----------------


def test_extract_html_text_string_ids(spark):
    from elephantdb_spark.operators.html import extract_html_text

    df = spark.createDataFrame(
        [("doc-a", "<html><title>T</title><p>hello</p></html>")],
        "doc_id string, html string",
    )
    rows = extract_html_text(df, "doc_id", "html").collect()
    assert rows[0]["id"] == "doc-a"
    assert rows[0]["title"] == "T"
    assert "hello" in rows[0]["text"]


def test_warc_records_df_string_ids(spark):
    from elephantdb_spark.sources.warc import build_warc, warc_records_df

    payload = build_warc(
        [
            {
                "warc_type": "response",
                "target_uri": "http://example.com/",
                "block": b"HTTP/1.1 200 OK\r\n\r\nbody",
            }
        ]
    )
    df = spark.createDataFrame(
        [("crawl-001", bytearray(payload))], "doc_id string, warc binary"
    )
    rows = warc_records_df(df, "doc_id", "warc").collect()
    assert len(rows) == 1
    assert rows[0]["id"] == "crawl-001"
    assert bytes(rows[0]["body"]) == b"body"


# --- ADVICE 4: hierarchical trainer must never exceed n_cells ------------


def test_hierarchical_trainer_caps_at_n_cells_with_wide_branch(spark):
    from elephantdb_spark.operators.ann import (
        train_ivf_centroids_hierarchical,
    )

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    # branch > n_cells is clamped to n_cells (more super-cells than total
    # cells is meaningless for the hierarchy); with the clamp in place the
    # floor-of-1 trim loop always converges and the budget holds exactly
    cents = train_ivf_centroids_hierarchical(
        emb, n_cells=4, branch=16, sample_size=256
    )
    assert len(cents) <= 4
    assert np.isfinite(cents).all()
