"""The test-support DSL itself (SURVEY §5 infrastructure): with-domain,
with-presharded-domain / with-sharding-fn, byte-exact comparison."""

from __future__ import annotations

import os

from elephantdb_spark.store import shard_dirname
from elephantdb_spark.testing import (
    assert_domain_contents,
    build_presharded_domain,
    build_test_domain,
)

PAIRS = [(b"key", b"v1"), (b"hey", b"v2"), (b"\x00", b"zero"), (b"null", None)]


def test_with_domain_builder(spark, tmp_path):
    dom = build_test_domain(spark, str(tmp_path / "d"), PAIRS)
    assert_domain_contents(dom, dict(PAIRS))
    assert dom.get(b"key") == b"v1"
    assert dom.get(b"null") is None  # null value stored, served as miss-alike
    assert dom.get(b"absent") is None


def test_presharded_placement_and_routing(spark, tmp_path):
    layout = {
        0: [(b"a", b"1"), (b"b", b"2")],
        3: [(b"z", b"26")],
        # shards 1 and 2 intentionally empty (common/domain.clj:384-385)
    }
    dom = build_presharded_domain(spark, str(tmp_path / "p"), layout)
    # physical placement honored
    vpath = dom.store.version_path(dom.current_version())
    rows = spark.read.option("basePath", vpath).parquet(vpath).collect()
    placed = {bytes(r.key): int(r.shard) for r in rows}
    assert placed == {b"a": 0, b"b": 0, b"z": 3}
    assert not os.path.isdir(os.path.join(vpath, shard_dirname(1)))
    # read routing goes through the same mocked scheme: point gets prune to
    # the configured shard and still hit
    assert dom.get(b"z") == b"26"
    assert dom.get(b"a") == b"1"
    assert dom.get(b"miss") is None
    assert_domain_contents(dom, {b"a": b"1", b"b": b"2", b"z": b"26"})


def test_presharded_rejects_out_of_range(spark, tmp_path):
    try:
        build_presharded_domain(spark, str(tmp_path / "x"), {9: [(b"k", b"v")]})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
