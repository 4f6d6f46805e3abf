"""Bucketed-table domains — the co-located-join scale path.

The versioned md5-mod store (build.py/engine.py) reproduces the reference's
layout and prunes point reads, but Spark has no metadata telling it two such
domains share a partitioning, so a domain-to-domain key join shuffles both
sides. This module is the Spark-native complement: the same (key, value)
data written as a *bucketed, sorted* managed table
(``bucketBy(n, key).sortBy(key)``), which gives Catalyst the physical
layout as metadata, so:

* **joins between same-bucket-count domains are shuffle-free** (sort-merge
  join with zero Exchange — at 100 TB this is the difference between moving
  both tables over the network and moving nothing);
* **point/multi-point lookups prune to one bucket file** via Spark's own
  bucket pruning (no driver-side routing needed).

Bucketing uses Spark's Murmur3 hash, not the reference's MD5-mod — this is
deliberately an *additional* capability, not the parity store: byte-exact
MD5-mod routing (SURVEY §2 A4) stays in the versioned store; bucketed
domains are what a user reaches for when join locality matters more than
reference parity. Both share the build contract (LWW dedup, binary kv).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from elephantdb_spark.build import dedup_last_writer_wins


def build_bucketed_domain(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    num_buckets: int,
    seq_col: str | None = None,
    dedup: str = "lww",
    path: str | None = None,
    overwrite: bool = False,
) -> None:
    """Write (key, value) as a bucketed, key-sorted managed table.

    One shuffle (the bucket placement); each bucket is a key-sorted file,
    the analogue of one shard. ``path`` makes it an external table.
    """
    data = df.select("key", "value") if dedup == "none" else dedup_last_writer_wins(df, seq_col)
    writer = (
        data.write.bucketBy(num_buckets, "key")
        .sortBy("key")
        .format("parquet")
        .mode("overwrite" if overwrite else "errorifexists")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def join_bucketed_domains(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    how: str = "inner",
) -> DataFrame:
    """Key-join two bucketed domains. With equal bucket counts Catalyst
    plans a sort-merge join with no Exchange on either side — verify with
    ``.explain()`` (tested in test_bucketed.py)."""
    lhs = spark.table(left_table).select("key", "value")
    rhs = spark.table(right_table).selectExpr("key", "value AS value_right")
    return lhs.join(rhs, "key", how)


def bucketed_multi_get(
    spark: SparkSession, table: str, keys: list[bytes], force_bucketed_scan: bool = True
) -> DataFrame:
    """Multi-point lookup over a bucketed domain; Spark's bucket pruning
    restricts the scan to the buckets the keys hash to
    (``SelectedBucketsCount: k out of n`` in the plan).

    ``force_bucketed_scan=True`` sets
    ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` — a
    SESSION-WIDE conf (plans are lazy, so it cannot be scoped to this one
    query): the auto heuristic only turns bucketed scans on for joins/aggs,
    never for single-table point filters, so without it the scan reads every
    bucket. `session.get_spark` sets the same value by default; pass False
    to leave foreign sessions untouched (correctness is unaffected, only
    pruning). The conf's only effect is that bucketed tables are always read
    bucket-aware — harmless for everything else."""
    from elephantdb_spark.engine import Domain

    if force_bucketed_scan:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    return (
        spark.table(table)
        .filter(Domain._key_in_filter(keys))
        .select("key", "value")
    )
