"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`elephantdb_spark.parity` (Part C reference
operators) and :mod:`elephantdb_spark.extensions` (LLM-data-pipeline
operators); this module is the thin contract shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build the customer_kv
    domain through the full engine (shard, sort, version-publish) and run a
    pruned multiGet over it."""
    from elephantdb_spark.parity import q03_multi_get_hits

    return q03_multi_get_hits(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from elephantdb_spark.parity import PART_C_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(PART_C_QUERIES)
    try:
        from elephantdb_spark.extensions import EXT_QUERIES

        out.update(EXT_QUERIES)
    except ImportError:
        pass
    try:
        from elephantdb_spark.analytics import ANALYTICS_QUERIES

        out.update(ANALYTICS_QUERIES)
    except ImportError:
        pass
    try:
        from elephantdb_spark.relational import RELATIONAL_QUERIES

        out.update(RELATIONAL_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from elephantdb_spark.parity import PART_C_ORACLES

    out: dict[str, str] = {}
    out.update(PART_C_ORACLES)
    try:
        from elephantdb_spark.extensions import EXT_ORACLES

        out.update(EXT_ORACLES)
    except ImportError:
        pass
    try:
        from elephantdb_spark.analytics import ANALYTICS_ORACLES

        out.update(ANALYTICS_ORACLES)
    except ImportError:
        pass
    try:
        from elephantdb_spark.relational import RELATIONAL_ORACLES

        out.update(RELATIONAL_ORACLES)
    except ImportError:
        pass
    return out
