"""Streaming updater tests: micro-batch → published version (A25 analogue)
and remote→local version sync with token-last publish ordering (A25/A26,
common/domain.clj:363-454)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from elephantdb_spark import Domain, DomainSpec, build_domain
from elephantdb_spark.store import VersionedStore
from elephantdb_spark.streaming import stream_build, sync_domain

SPEC = DomainSpec(num_shards=4)


def _write_batch(spark, feed_dir, pairs, fname):
    # the file stream source lists *files* in input_dir (no recursion) —
    # stage the parquet then drop the part file in as <fname>.parquet
    import glob
    import shutil
    import tempfile

    staging = tempfile.mkdtemp()
    df = spark.createDataFrame(pairs, "key binary, value binary")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(feed_dir, f"{fname}.parquet"))
    shutil.rmtree(staging)


def test_stream_build_incremental_versions(spark, tmp_path):
    feed = str(tmp_path / "feed")
    root = str(tmp_path / "dom")
    os.makedirs(feed)

    _write_batch(spark, feed, [(b"a", b"1"), (b"b", b"2")], "batch1")
    q = stream_build(spark, feed, root, SPEC, version_fn=lambda bid: bid + 1)
    q.awaitTermination(120)

    dom = Domain(spark, root)
    assert dom.to_map() == {b"a": b"1", b"b": b"2"}
    v1 = dom.current_version()

    # second feed file → new published version, merged, new wins
    _write_batch(spark, feed, [(b"b", b"NEW"), (b"c", b"3")], "batch2")
    q = stream_build(spark, feed, root, SPEC, version_fn=lambda bid: bid + 1)
    q.awaitTermination(120)

    dom = Domain(spark, root)
    assert dom.current_version() > v1
    assert dom.to_map() == {b"a": b"1", b"b": b"NEW", b"c": b"3"}
    # hot-swap visibility: the old version is still pinned-readable
    assert dom.to_map(version=v1) == {b"a": b"1", b"b": b"2"}
    # exactly-once: re-running the stream with no new files adds no version
    versions_before = dom.versions()
    q = stream_build(spark, feed, root, SPEC, version_fn=lambda bid: bid + 1)
    q.awaitTermination(120)
    assert Domain(spark, root).versions() == versions_before


def test_sync_domain_pull_and_gc(spark, tmp_path):
    remote = str(tmp_path / "remote")
    local = str(tmp_path / "local")
    kv = spark.createDataFrame([(b"k", b"v1")], "key binary, value binary")
    build_domain(spark, kv, remote, SPEC, version=1)

    assert sync_domain(remote, local) == 1
    assert Domain(spark, local).to_map() == {b"k": b"v1"}
    # already up to date → no-op
    assert sync_domain(remote, local) is None

    kv2 = spark.createDataFrame([(b"k", b"v2")], "key binary, value binary")
    build_domain(spark, kv2, remote, version=2)
    assert sync_domain(remote, local, versions_to_keep=1) == 2
    local_dom = Domain(spark, local)
    assert local_dom.to_map() == {b"k": b"v2"}
    # GC kept only the newest local version (common/domain.clj:126-133)
    assert local_dom.versions() == [2]


def test_sync_domain_token_last(tmp_path):
    # a remote with data dir but NO token must not be synced
    remote = str(tmp_path / "r2")
    vs = VersionedStore(remote)
    os.makedirs(vs.create_version(5))
    assert sync_domain(remote, str(tmp_path / "l2")) is None


def test_sync_rate_limited(spark, tmp_path):
    remote = str(tmp_path / "r3")
    local = str(tmp_path / "l3")
    kv = spark.createDataFrame([(b"k", b"v")], "key binary, value binary")
    build_domain(spark, kv, remote, SPEC, version=1)
    # very high limit → effectively instant, but exercises the chunked path
    assert sync_domain(remote, local, rate_limit_kbps=1_000_000) == 1
    assert Domain(spark, local).to_map() == {b"k": b"v"}


def test_dedup_stream_across_microbatches(spark, tmp_path):
    """dropDuplicatesWithinWatermark-based dedup: re-deliveries of a key in
    a later micro-batch (within the watermark horizon) are dropped; each
    key reaches the sink exactly once with its first-seen payload."""
    from datetime import datetime

    from elephantdb_spark.streaming import dedup_stream

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)

    def write_feed(rows, fname):
        import glob
        import shutil
        import tempfile

        staging = tempfile.mkdtemp()
        df = spark.createDataFrame(rows, "k string, ts timestamp, payload string")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(feed, f"{fname}.parquet"))
        shutil.rmtree(staging)

    def run_once():
        stream = spark.readStream.schema("k string, ts timestamp, payload string").parquet(feed)
        deduped = dedup_stream(stream, ["k"], "ts", "10 minutes")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t = datetime(2026, 1, 1, 10, 0, 0)

    def at(sec):
        return t.replace(second=0).replace(minute=sec // 60, second=sec % 60)

    # batch 1: A twice (in-batch dup), B once
    write_feed(
        [("A", at(0), "first-A"), ("B", at(30), "first-B"), ("A", at(45), "dup-A")],
        "b1",
    )
    run_once()
    # batch 2: A re-delivered (cross-batch dup), C new
    write_feed([("A", at(120), "late-dup-A"), ("C", at(150), "first-C")], "b2")
    run_once()

    got = {
        r.k: r.payload
        for r in spark.read.schema("k string, ts timestamp, payload string")
        .parquet(out)
        .collect()
    }
    assert set(got) == {"A", "B", "C"}
    assert got["B"] == "first-B" and got["C"] == "first-C"
    assert got["A"] in ("first-A",)  # first writer wins, dups never surface


def test_launch_updater_polls_and_hot_swaps(spark, tmp_path):
    """launch-updater! parity (common/database.clj:95-107): a version
    published to the remote store appears locally within one polling
    interval, and the local reader hot-swaps without a new handle."""
    import time

    from elephantdb_spark import Engine
    from elephantdb_spark.streaming import launch_updater

    remote_root = str(tmp_path / "remote")
    spec = DomainSpec(num_shards=4)
    build_domain(
        spark,
        spark.createDataFrame([(b"1", b"v1")], "key binary, value binary"),
        os.path.join(remote_root, "dom"), spec, version=1,
    )

    eng = Engine(spark, str(tmp_path / "local"))
    updater = launch_updater(eng, remote_root, interval_s=0.2)
    try:
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if "dom" in eng.list_domains() and eng.domain("dom").current_version() == 1:
                break
            time.sleep(0.05)
        dom = eng.domain("dom")
        assert dom.current_version() == 1
        assert dom.get(b"1") == b"v1"

        # publish v2 remotely → the SAME local handle swaps within ~1 cycle
        build_domain(
            spark,
            spark.createDataFrame([(b"1", b"v2")], "key binary, value binary"),
            os.path.join(remote_root, "dom"), version=2,
        )
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if dom.current_version() == 2:
                break
            time.sleep(0.05)
        assert dom.current_version() == 2
        assert dom.get(b"1") == b"v2"
        assert updater.last_results is not None
        assert updater.last_error is None
        assert updater.cycles >= 1
    finally:
        updater.stop()
    assert not updater.running()
