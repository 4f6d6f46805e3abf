"""Property-based build→read roundtrip: arbitrary binary keys/values must
survive the full engine path byte-exactly (SURVEY §7 hard part #3 — binary
fidelity through Arrow/Parquet incl. empty, high-bit, and long keys)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elephantdb_spark import DomainSpec, build_domain
from elephantdb_spark.engine import Domain

# one Spark build per example is expensive — keep examples few but nasty
keys_st = st.lists(
    st.binary(min_size=0, max_size=300),
    min_size=1,
    max_size=12,
    unique=True,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(keys=keys_st, data=st.data())
def test_roundtrip_arbitrary_binary_kv(spark, tmp_path_factory, keys, data):
    values = [
        data.draw(st.one_of(st.none(), st.binary(min_size=0, max_size=300)))
        for _ in keys
    ]
    root = str(tmp_path_factory.mktemp("prop") / "d")
    pairs = list(zip(keys, values))
    df = spark.createDataFrame(pairs, "key binary, value binary")
    build_domain(spark, df, root, DomainSpec(num_shards=3), version=1)
    dom = Domain(spark, root)

    # full-map equality (A16) — byte-exact, None-preserving
    assert dom.to_map() == dict(pairs)
    # point + local serving paths agree for every key, plus a guaranteed miss
    for k, v in pairs:
        assert dom.get(k) == v
        assert dom.local_get(k) == v
    miss = b"\x00miss\xff" * 40
    assert dom.get(miss) is None and dom.local_get(miss) is None
    # multiGet preserves order-free key set incl. the miss
    got = dom.multi_get([*keys, miss])
    assert got == {**dict(pairs), miss: None}


@pytest.mark.parametrize("size", [1 << 10, 1 << 20])
def test_large_values_roundtrip(spark, tmp_path, size):
    payload = bytes(range(256)) * (size // 256)
    root = str(tmp_path / f"big{size}")
    df = spark.createDataFrame([(b"big", payload)], "key binary, value binary")
    build_domain(spark, df, root, DomainSpec(num_shards=2), version=1)
    dom = Domain(spark, root)
    assert dom.get(b"big") == payload
    assert dom.local_get(b"big") == payload
