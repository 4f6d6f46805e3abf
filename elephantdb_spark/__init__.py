"""elephantdb_spark — a PySpark-native engine with the query and
data-processing capabilities of nathanmarz/elephantdb.

A *domain* is a versioned, MD5-mod-sharded key/value dataset
(`key: binary, value: binary`) stored as key-sorted Parquet shards with an
atomic token-publish commit (reference:
elephantdb-core/src/jvm/elephantdb/store/VersionedStore.java). Reads
(`get`, `multi_get`, `scan`, `count`) resolve the current published version
and prune to exactly the shards their keys hash to (reference:
elephantdb-server/src/clj/elephantdb/common/domain.clj:243-259).

Everything is expressed Spark-first: the build path is one shuffle
(`repartition` + `sortWithinPartitions` + partitioned Parquet write), the
read path is Catalyst partition pruning + Parquet row-group skipping, and the
only custom kernels are the MD5-mod sharding expression and the versioned
commit protocol.
"""

from elephantdb_spark.spec import DomainSpec
from elephantdb_spark.sharding import shard_index, md5_mod_col, duckdb_md5_mod_sql
from elephantdb_spark.store import VersionedStore, DomainStore
from elephantdb_spark.build import (
    StagedBuild,
    build_domain,
    compact_domain,
    reshard,
    update_domain,
)
from elephantdb_spark.engine import Engine, Domain, WrongHostError, DomainNotFoundError, DomainNotLoadedError
from elephantdb_spark.registry import register_scheme, resolve_scheme, class_for_name

__all__ = [
    "DomainSpec",
    "shard_index",
    "md5_mod_col",
    "duckdb_md5_mod_sql",
    "VersionedStore",
    "DomainStore",
    "StagedBuild",
    "build_domain",
    "update_domain",
    "reshard",
    "compact_domain",
    "Engine",
    "Domain",
    "WrongHostError",
    "DomainNotFoundError",
    "DomainNotLoadedError",
    "register_scheme",
    "resolve_scheme",
    "class_for_name",
]

__version__ = "0.1.0"
