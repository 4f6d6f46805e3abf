"""clean_stream: streaming quality gate + redaction + digest dedup across
micro-batches equals the batch stateless+exact stages on the union."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from datetime import datetime

from elephantdb_spark.streaming.pipeline import clean_stream

SCHEMA = "doc_id long, ts timestamp, text string"


def _write_feed(spark, feed, rows, fname):
    staging = tempfile.mkdtemp()
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(feed, f"{fname}.parquet"))
    shutil.rmtree(staging)


def test_clean_stream_across_microbatches(spark, tmp_path):
    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(feed)
        cleaned = clean_stream(
            stream, "text", "ts", min_tokens=5,
            max_dup_ngram_frac=0.5, redact=True,
            watermark_delay="10 minutes",
        )
        q = (
            cleaned.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t0 = datetime(2026, 1, 1, 10, 0, 0)

    def at(sec):
        return t0.replace(minute=sec // 60, second=sec % 60)

    good = "the quick brown fox jumps over the lazy dog today"
    pii = "reach me at bob@corp.io about the quick brown fox results"
    short = "too short"
    spammy = "spam spam spam spam spam spam spam spam"  # dup-2gram frac 6/7

    # batch 1: good doc, PII doc, a too-short doc, a spam doc, and an
    # in-batch exact duplicate of good
    _write_feed(spark, feed, [
        (1, at(0), good),
        (2, at(10), pii),
        (3, at(20), short),
        (4, at(30), spammy),
        (5, at(40), good),
    ], "b1")
    run_once()
    # batch 2: cross-batch re-delivery of good AND of the pii doc
    # (note: dedup is on REDACTED text digest, so a re-delivered pii doc
    # dedups against its first redacted form), plus one new doc
    _write_feed(spark, feed, [
        (6, at(120), good),
        (7, at(130), pii),
        (8, at(140), "a completely fresh document with plenty of words here"),
    ], "b2")
    run_once()

    rows = spark.read.schema(SCHEMA).parquet(out).collect()
    by_text = {}
    for r in rows:
        by_text.setdefault(r.text, []).append(r.doc_id)

    # exactly three surviving distinct texts: good, redacted pii, fresh
    assert len(rows) == 3, rows
    assert set(len(v) for v in by_text.values()) == {1}
    texts = set(by_text)
    assert good in texts
    assert any("<EMAIL>" in t and "bob@corp.io" not in t for t in texts)
    assert any("fresh document" in t for t in texts)
    # gate victims never surfaced
    assert all(r.doc_id not in (3, 4) for r in rows)


def test_clean_stream_curation_stages_match_batch(spark, tmp_path):
    """normalize + gopher in the stream == the batch curation front-end on
    the union of micro-batches (same Column expressions, so the only
    difference is delivery), including dedup on the NORMALIZED bytes."""
    from pyspark.sql import functions as F

    from elephantdb_spark.operators.curation import (
        gopher_rule_cols,
        normalize_text,
    )

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)

    gopher_cfg = {"min_words": 8}

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(feed)
        cleaned = clean_stream(
            stream, "text", "ts", min_tokens=None, redact=False,
            normalize=True, gopher=gopher_cfg,
            watermark_delay="10 minutes",
        )
        q = (
            cleaned.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t0 = datetime(2026, 1, 1, 10, 0, 0)
    clean = "the quick brown foxes of forest jumped over a lazy dog"
    messy = "the\t\tquick  brown\tfoxes of forest jumped over a lazy dog \r\n"
    fresh = "a tiny story of brave mice running through green fields"
    b1 = [(1, t0, messy), (2, t0, "word word word")]
    b2 = [(3, t0.replace(minute=2), clean), (4, t0.replace(minute=3), fresh)]
    _write_feed(spark, feed, b1, "b1")
    run_once()
    _write_feed(spark, feed, b2, "b2")
    run_once()

    got = {r.text for r in spark.read.schema(SCHEMA).parquet(out).collect()}

    # batch twin on the union: normalize -> gopher -> distinct texts
    union = spark.createDataFrame(b1 + b2, SCHEMA)
    norm = normalize_text(union, "text")
    kept = norm.filter(gopher_rule_cols(F.col("text"), **gopher_cfg)["kept"])
    want = {r.text for r in kept.select("text").distinct().collect()}

    assert got == want
    # the messy and clean deliveries collapsed to ONE canonical survivor
    assert got == {clean, fresh}


def test_clean_stream_rejects_out_of_contract_gopher(spark, tmp_path):
    """gopher=1 (or any non-bool non-dict) must raise, not silently skip
    the quality gate (review finding, r4 pass 4)."""
    import pytest

    stream = spark.readStream.schema(SCHEMA).parquet(str(tmp_path))
    with pytest.raises(ValueError, match="gopher must be"):
        clean_stream(stream, "text", "ts", gopher=1)
    # empty dict still gates; None/False are off — all construct fine
    clean_stream(stream, "text", "ts", gopher={})
    clean_stream(stream, "text", "ts", gopher=None)
    clean_stream(stream, "text", "ts", gopher=False)
