"""Test-support surface replicating the reference's test infrastructure
(SURVEY §5):

* :func:`kv_df` — literal key/value pairs → canonical domain input (the
  universal fixture of the reference tests, test/common.clj:146-213).
* :func:`build_test_domain` — the ``with-domain`` builder DSL
  (test/keyval.clj:93-139): build + publish a domain from literal pairs,
  return the read handle.
* :class:`FixedAssignmentScheme` / :func:`build_presharded_domain` — the
  ``with-presharded-domain`` + ``with-sharding-fn`` pair
  (test/keyval.clj:113-139, test/common.clj:178-203): place chosen keys on
  chosen shards by swapping the sharding scheme, through the same
  registry hook production schemes use (DomainSpec.java:46-62 analogue) —
  placement mocking exercises the identical build/read code paths.
* :func:`assert_domain_contents` — byte-exact whole-domain comparison
  (``barr=``/``barrs=``, test/common.clj:51-74).

The reference's MemoryCoordinator (atom-backed fake storage engine,
test/keyval.clj:230-270) exists to dodge BerkeleyDB in unit tests; shards
here are plain local parquet in a tmp dir, which is already as cheap and
as inspectable, so a RAM-backed format would only add a second code path —
deliberately not replicated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from elephantdb_spark.build import build_domain
from elephantdb_spark.engine import Domain, KV_SCHEMA
from elephantdb_spark.spec import DomainSpec

#: canonical test spec: 4 shards, hash-mod (test/common.clj:78-84,277)
CANONICAL_NUM_SHARDS = 4


def kv_df(
    spark: SparkSession, pairs: list[tuple[bytes, bytes | None]]
) -> DataFrame:
    """Literal (key, value) byte pairs → canonical domain-input DataFrame
    (values nullable, keys not)."""
    rows = [(bytes(k), None if v is None else bytes(v)) for k, v in pairs]
    return spark.createDataFrame(rows, KV_SCHEMA)


class FixedAssignmentScheme:
    """A ShardingScheme routing by an explicit key→shard map — the
    ``with-sharding-fn`` analogue. Configure the class (it is instantiated
    no-arg through the registry, like the reference's reflective load),
    reference it by dotted name in the spec.

    Test-support only: the assignment map is process-local class state, so
    a domain built with this scheme routes correctly only while the
    configuring process lives. ``shard_col`` is a chained CASE expression —
    fine for fixture-sized key sets, not a production path.
    """

    _assignments: dict[bytes, int] = {}
    _default: int = 0

    @classmethod
    def configure(cls, assignments: dict[bytes, int], default: int = 0) -> None:
        cls._assignments = {bytes(k): int(s) for k, s in assignments.items()}
        cls._default = int(default)

    def shard_index(self, key: bytes, num_shards: int) -> int:
        return self._assignments.get(bytes(key), self._default) % num_shards

    def shard_col(self, key: Column, num_shards: int) -> Column:
        expr: Column = F.lit(self._default)
        for k, s in self._assignments.items():
            expr = F.when(key == F.lit(k), F.lit(s % num_shards)).otherwise(expr)
        return expr.cast("int")


FIXED_SCHEME_NAME = f"{FixedAssignmentScheme.__module__}.FixedAssignmentScheme"


def build_test_domain(
    spark: SparkSession,
    root: str,
    pairs: list[tuple[bytes, bytes | None]],
    num_shards: int = CANONICAL_NUM_SHARDS,
    version: int = 1,
    **spec_kwargs,
) -> Domain:
    """``with-domain``: build + publish a domain from literal pairs and
    hand back the read handle."""
    spec = DomainSpec(num_shards=num_shards, **spec_kwargs)
    build_domain(spark, kv_df(spark, pairs), root, spec, version=version)
    return Domain(spark, root)


def build_presharded_domain(
    spark: SparkSession,
    root: str,
    shard_to_pairs: dict[int, list[tuple[bytes, bytes | None]]],
    num_shards: int = CANONICAL_NUM_SHARDS,
    version: int = 1,
) -> Domain:
    """``with-presharded-domain``: place each pair list on its stated
    shard (shards absent from the map stay empty) by configuring the
    fixed-assignment scheme and building through the normal pipeline."""
    assignments: dict[bytes, int] = {}
    pairs: list[tuple[bytes, bytes | None]] = []
    for shard, shard_pairs in shard_to_pairs.items():
        if not 0 <= shard < num_shards:
            raise ValueError(f"shard {shard} out of range 0..{num_shards - 1}")
        for k, v in shard_pairs:
            assignments[bytes(k)] = shard
            pairs.append((k, v))
    FixedAssignmentScheme.configure(assignments)
    spec = DomainSpec(num_shards=num_shards, shard_scheme=FIXED_SCHEME_NAME)
    build_domain(spark, kv_df(spark, pairs), root, spec, version=version)
    return Domain(spark, root)


def assert_domain_contents(
    domain: Domain, expected: dict[bytes, bytes | None], version: int | None = None
) -> None:
    """Byte-exact whole-domain equality (``barrs=`` analogue)."""
    got = {
        bytes(r.key): (None if r.value is None else bytes(r.value))
        for r in domain.scan(version).collect()
    }
    want = {
        bytes(k): (None if v is None else bytes(v)) for k, v in expected.items()
    }
    assert got == want, f"domain contents mismatch: {got} != {want}"
