"""Host→shard assignment parity (shard.clj:8-41, shard_test.clj:5-29)."""

from __future__ import annotations

import pytest

from elephantdb_spark.assignment import (
    compute_host_to_shards,
    generate_index,
    invert_to_shard_to_hosts,
    prioritize_hosts,
)


def test_docstring_example():
    # (compute-host->shards ["a" "b"] 5 1) => {"b" #{1 3}, "a" #{0 2 4}}
    assert compute_host_to_shards(["a", "b"], 5, 1) == {
        "a": {0, 2, 4},
        "b": {1, 3},
    }


def test_replication_distinct_hosts():
    h2s = compute_host_to_shards(["a", "b", "c"], 6, 2)
    s2h = invert_to_shard_to_hosts(h2s)
    for s, hosts in s2h.items():
        assert len(hosts) == 2  # each shard on exactly `replication` hosts
    total = sum(len(v) for v in h2s.values())
    assert total == 12


def test_replication_exceeds_hosts():
    with pytest.raises(ValueError):
        compute_host_to_shards(["a"], 4, 2)


def test_prioritize_hosts():
    idx = generate_index(["a", "b", "c"], 3, 2)
    shard0_hosts = idx["shards_to_hosts"][0]
    pri = prioritize_hosts(idx, 0, preferred={"b"})
    assert set(pri) == shard0_hosts
    if "b" in shard0_hosts:
        assert pri[0] == "b"
    assert prioritize_hosts(idx, 99, preferred=set()) is None
