"""Shard → host assignment math (pure functions, kept for parity tests).

The reference assigns shards to serving hosts round-robin with replication
(reference: elephantdb-server/src/clj/elephantdb/common/shard.clj:8-41,
tested in test/elephantdb/common/shard_test.clj:5-29). Spark executors own
partitions at runtime, so this module is not on any query path — it exists
so the reference's assignment semantics remain checkable.
"""

from __future__ import annotations

import itertools


def compute_host_to_shards(
    hosts: list[str], shard_count: int, replication: int
) -> dict[str, set[int]]:
    """Round-robin with replication; each replica of a shard lands on a
    distinct host (shard.clj:17-27). Example::

        compute_host_to_shards(["a", "b"], 5, 1)
        # {"a": {0, 2, 4}, "b": {1, 3}}
    """
    if len(hosts) < replication:
        raise ValueError("Replication greater than number of servers")
    assignment: dict[str, set[int]] = {}
    cyc = itertools.cycle(hosts)
    for shard in [s for _ in range(replication) for s in range(shard_count)]:
        host = next(cyc)
        while shard in assignment.get(host, set()):
            host = next(cyc)
        assignment.setdefault(host, set()).add(shard)
    return assignment


def invert_to_shard_to_hosts(
    host_to_shards: dict[str, set[int]]
) -> dict[int, set[str]]:
    """Inverse multimap (shard.clj:33-41)."""
    out: dict[int, set[str]] = {}
    for host, shards in host_to_shards.items():
        for s in shards:
            out.setdefault(s, set()).add(host)
    return out


def generate_index(
    hosts: list[str], shard_count: int, replication: int
) -> dict[str, dict]:
    h2s = compute_host_to_shards(hosts, shard_count, replication)
    return {"hosts_to_shards": h2s, "shards_to_hosts": invert_to_shard_to_hosts(h2s)}


def prioritize_hosts(
    shard_index: dict[str, dict], shard: int, preferred: set[str]
) -> list[str] | None:
    """Hosts serving ``shard``, preferred ones first (shard.clj:55-62).
    Deterministic variant: sorted within each class instead of shuffled."""
    hosts = shard_index["shards_to_hosts"].get(shard)
    if hosts is None:
        return None
    pref = sorted(h for h in hosts if h in preferred)
    rest = sorted(h for h in hosts if h not in preferred)
    return pref + rest
