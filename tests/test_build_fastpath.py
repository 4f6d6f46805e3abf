"""dedup='none' single-shuffle build fast path."""

from __future__ import annotations

import pytest

from elephantdb_spark import Domain, DomainSpec, build_domain
from elephantdb_spark.sharding import shard_index


def test_nodedup_build_equivalent_for_unique_keys(spark, tmp_path):
    pairs = [(str(i).encode(), str(i * i).encode()) for i in range(100)]
    df = spark.createDataFrame(pairs, "key binary, value binary")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_domain(spark, df, a, DomainSpec(num_shards=4), version=1)
    build_domain(spark, df, b, DomainSpec(num_shards=4), version=1, dedup="none")
    da, db = Domain(spark, a), Domain(spark, b)
    assert da.to_map() == db.to_map()
    for r in db.scan().collect():
        assert r.shard == shard_index(bytes(r.key), 4)


def test_invalid_dedup_mode(spark, tmp_path):
    df = spark.createDataFrame([(b"k", b"v")], "key binary, value binary")
    with pytest.raises(ValueError):
        build_domain(spark, df, str(tmp_path / "x"), DomainSpec(num_shards=2),
                     version=1, dedup="bogus")
