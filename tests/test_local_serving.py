"""Local serving-path tests: pyarrow point probes must agree byte-for-byte
with the Spark read path (the reference's serving read is exactly this — a
local persistence probe, JavaBerkDB.java:70-82, never a cluster job)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elephantdb_spark import DomainSpec, Engine, build_domain

PAIRS = [(f"key{i:04d}".encode(), f"val{i}".encode()) for i in range(500)]


@pytest.fixture(scope="module")
def dom(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve") / "d")
    build_domain(
        spark,
        spark.createDataFrame(PAIRS, "key binary, value binary"),
        root,
        DomainSpec(num_shards=8),
        version=1,
    )
    from elephantdb_spark.engine import Domain

    return Domain(spark, root)


def test_local_get_agrees_with_spark_get(dom):
    for k in (b"key0000", b"key0042", b"key0499"):
        assert dom.local_get(k) == dom.get(k)
        assert dom.local_get(k) is not None


def test_local_get_miss_and_empty_key(dom):
    assert dom.local_get(b"nope") is None
    assert dom.local_get(b"") is None


def test_local_multi_get_mixed(dom):
    keys = [b"key0001", b"key0250", b"missing", b""]
    got = dom.local_multi_get(keys)
    assert set(got) == set(keys)
    assert got[b"key0001"] == b"val1"
    assert got[b"key0250"] == b"val250"
    assert got[b"missing"] is None
    spark_got = dom.multi_get(keys)
    assert got == spark_got


def test_local_get_on_pinned_version(spark, tmp_path):
    from elephantdb_spark import update_domain
    from elephantdb_spark.engine import Domain

    root = str(tmp_path / "versioned")
    build_domain(
        spark,
        spark.createDataFrame([(b"a", b"1")], "key binary, value binary"),
        root, DomainSpec(num_shards=2), version=1,
    )
    update_domain(
        spark,
        spark.createDataFrame([(b"a", b"2")], "key binary, value binary"),
        root, version=2,
    )
    d = Domain(spark, root)
    assert d.local_get(b"a") == b"2"
    assert d.local_get(b"a", version=1) == b"1"


def test_row_group_size_opt_respected(spark, tmp_path):
    from elephantdb_spark.engine import Domain

    root = str(tmp_path / "rg")
    pairs = [(f"k{i:05d}".encode(), (b"x" * 100)) for i in range(20000)]
    build_domain(
        spark,
        spark.createDataFrame(pairs, "key binary, value binary"),
        root,
        DomainSpec(num_shards=2, persistence_opts={"parquet.block.size": 65536}),
        version=1,
    )
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(f"{root}/1/shard=*/*.parquet")
    assert files
    # small block size → multiple row groups per shard file, so the local
    # probe's min/max skipping has something to skip
    assert any(pq.ParquetFile(f).metadata.num_row_groups > 1 for f in files)
    d = Domain(spark, root)
    assert d.local_get(b"k00042") == b"x" * 100
