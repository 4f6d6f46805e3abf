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


def _last_verified_round(
    oracles: dict[str, str], here: str | None = None
) -> dict[str, int]:
    """Map query name -> latest round in which the driver verified it.

    "Verified" means the CORRECTNESS_r{N}.json row hash-matched, or was a
    rows-only check for a query that (still) has no oracle.  A query whose
    row hash-failed, or that gained an oracle after its last rows-only
    check, counts as never-verified so it sorts to the front of the
    driver's bounded per-round query window.
    """
    import glob
    import json
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and name not in oracles
            )
            if ok:
                last[name] = max(last.get(name, -1), rnd)
    return last


def _rotated(
    out: dict[str, Callable[[SparkSession, str], DataFrame]],
) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Order queries least-recently-verified first.

    The driver checks a bounded prefix of this dict each round; rotating by
    verification age guarantees every query's green row is at most a couple
    of rounds old instead of silently ageing out (round-2 verdict item 3).
    """
    last = _last_verified_round(oracle_sql())
    names = list(out)
    order = sorted(range(len(names)), key=lambda i: (last.get(names[i], -1), i))
    return {names[i]: out[names[i]] for i in order}


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
    return _rotated(out)


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
