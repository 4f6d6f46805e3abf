"""File-source readers producing canonical ``(key, value)`` domain input,
plus the domain-as-source reader.

The reference ingests through Cascading/Cascalog taps over any Hadoop
FileSystem (reference: elephantdb-cascading/src/jvm/elephantdb/cascading/
ElephantDBTap.java:95-128) — the format zoo lives upstream of the tap. The
Spark equivalents are the built-in DataFrame readers; these wrappers fix
the two decisions that matter for a 100 TB export job:

* an explicit schema is required for text formats (no inference job over
  the full input);
* the projection to (key, value) happens in the same plan as the read, so
  column pruning reaches the scan.

``read_domain`` is the inverse direction: a published domain version as a
DataFrame source (A11/A12/A14 — ElephantInputFormat.java:58-114 — one task
per shard file, version-pinnable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from elephantdb_spark.sources.encoders import kv_from_columns


def kv_from_parquet(
    spark: SparkSession,
    path: str,
    key_cols: list[str] | str,
    value_cols: list[str] | str,
    **options,
) -> DataFrame:
    """Parquet source → (key, value). Column pruning pushes the key/value
    projection into the scan's ReadSchema."""
    return kv_from_columns(
        spark.read.options(**options).parquet(path), key_cols, value_cols
    )


def kv_from_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    key_cols: list[str] | str,
    value_cols: list[str] | str,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV source → (key, value). ``schema`` (DDL string) is mandatory:
    schema inference reads the input twice, which is never acceptable at
    export scale."""
    df = (
        spark.read.options(**options)
        .schema(schema)
        .csv(path, header=header)
    )
    return kv_from_columns(df, key_cols, value_cols)


def kv_from_json(
    spark: SparkSession,
    path: str,
    schema: str,
    key_cols: list[str] | str,
    value_cols: list[str] | str,
    **options,
) -> DataFrame:
    """JSON-lines source → (key, value); explicit DDL schema required for
    the same single-pass reason as CSV."""
    df = spark.read.options(**options).schema(schema).json(path)
    return kv_from_columns(df, key_cols, value_cols)


def read_domain(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """A published domain version as a DataFrame source: (key, value,
    shard), one input split per shard file, rows in within-shard key order
    (A11/A13; version pin = A12)."""
    from elephantdb_spark.engine import Domain

    return Domain(spark, root).scan(version=version)
