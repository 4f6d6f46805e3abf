"""DomainSpec — the persisted description of a domain.

Mirrors the reference's ``DomainSpec`` (num_shards + coordinator class +
shard scheme + persistence options, persisted beside the data and
value-checked on every open — reference:
elephantdb-core/src/jvm/elephantdb/DomainSpec.java:19-36,95-166). The
rebuild persists JSON (``domain-spec.json``) instead of YAML; the contract
(round-trip + equality check, mismatch on open is an error) is identical.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

SPEC_FILENAME = "domain-spec.json"

#: The only sharding scheme the reference ships (HashModScheme.java:7-9).
HASH_MOD_SCHEME = "md5-mod"


class SpecMismatchError(ValueError):
    """Supplied spec differs from the one on disk (DomainStore.java:40-53)."""


@dataclass(frozen=True)
class DomainSpec:
    num_shards: int
    shard_scheme: str = HASH_MOD_SCHEME
    persistence_format: str = "parquet"
    persistence_opts: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        # Reference asserts a positive shard count
        # (tested in test/elephantdb/common/spec_test.clj:9-24).
        if self.num_shards <= 0:
            raise ValueError(f"num_shards must be positive, got {self.num_shards}")

    def to_dict(self) -> dict[str, Any]:
        return {
            "num_shards": self.num_shards,
            "shard_scheme": self.shard_scheme,
            "persistence_format": self.persistence_format,
            "persistence_opts": dict(self.persistence_opts),
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "DomainSpec":
        return cls(
            num_shards=int(d["num_shards"]),
            shard_scheme=d.get("shard_scheme", HASH_MOD_SCHEME),
            persistence_format=d.get("persistence_format", "parquet"),
            persistence_opts=dict(d.get("persistence_opts", {})),
        )

    def write(self, domain_root: str) -> str:
        os.makedirs(domain_root, exist_ok=True)
        path = os.path.join(domain_root, SPEC_FILENAME)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.to_dict(), f, indent=2, sort_keys=True)
        os.replace(tmp, path)
        return path

    @classmethod
    def read(cls, domain_root: str) -> "DomainSpec":
        with open(os.path.join(domain_root, SPEC_FILENAME)) as f:
            return cls.from_dict(json.load(f))

    @classmethod
    def exists(cls, domain_root: str) -> bool:
        return os.path.exists(os.path.join(domain_root, SPEC_FILENAME))

    def assert_matches(self, other: "DomainSpec") -> None:
        """Value-equality check on open (DomainSpec.java:161-166)."""
        if self != other:
            raise SpecMismatchError(
                f"supplied spec {self.to_dict()} != stored spec {other.to_dict()}"
            )

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, DomainSpec):
            return NotImplemented
        return self.to_dict() == other.to_dict()

    def __hash__(self) -> int:
        return hash((self.num_shards, self.shard_scheme, self.persistence_format))
