"""Vector-column analytics: deterministic group centroids.

The distributed-float-sum problem: ``sum(double)`` over a shuffled group
is order-dependent (fp addition doesn't associate), so a centroid
computed twice — or by two engines — differs in the last ulps and can
never be hash-verified. The fix here is fixed-point aggregation: scale
each component to an integer (``floor(v · 2^scale_bits)``), sum integers
(exact, order-free, overflow-safe: 2^23-bounded components × 2^40 scale
× ≤2^39 rows fits int64), and divide once at the end. The result is
bit-identical on any cluster size, any partitioning, any engine — the
property that makes the op oracle-checkable and re-runs reproducible.
Precision cost: each component is quantized to 2^-40 (~1e-12) before
averaging — float32 embeddings carry ~1e-7 noise, five orders louder.

Scale shape: posexplode → one map-side-combinable (group, dim) sum —
shuffle rows are (group, dim, int64), never whole vectors. Centroids per
group are dim-sized rows, not arrays, so downstream joins prune columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default fixed-point scale: 2^-40 quantization (~1e-12) — far below
#: float32 embedding noise, far above int64 overflow territory.
DEFAULT_SCALE_BITS = 40


def group_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> DataFrame:
    """Per-group centroid of a vector column, one output row per
    (``group_col``, ``dim``) with 1-based ``dim``: ``centroid`` is the
    fixed-point group mean of component ``dim`` (see module docstring),
    plus ``n`` group members. Deterministic under any execution order.
    """
    if not (1 <= scale_bits <= 60):
        raise ValueError(f"scale_bits must be in [1, 60], got {scale_bits}")
    scale = float(2**scale_bits)
    exploded = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("__pos", "__v"),
    ).select(
        group_col,
        (F.col("__pos") + 1).cast("bigint").alias("dim"),
        F.floor(F.col("__v").cast("double") * F.lit(scale)).cast("long").alias("__sv"),
    )
    return (
        exploded.groupBy(group_col, "dim")
        .agg(F.sum("__sv").alias("__s"), F.count(F.lit(1)).alias("n"))
        .select(
            group_col,
            "dim",
            (
                F.col("__s").cast("double")
                / (F.col("n").cast("double") * F.lit(scale))
            ).alias("centroid"),
            "n",
        )
    )


def duckdb_group_centroids_sql(
    table: str,
    group_col: str,
    vec_col: str,
    dim: int,
    scale_bits: int = DEFAULT_SCALE_BITS,
) -> str:
    """DuckDB twin computing the identical fixed-point centroid."""
    scale = float(2**scale_bits)
    return (
        f"WITH e AS (SELECT {group_col}, {vec_col} AS v, "
        f"  unnest(generate_series(1, {dim})) AS dim FROM {table}), "
        f"x AS (SELECT {group_col}, dim, "
        f"  CAST(floor(CAST(v[dim] AS DOUBLE) * {scale}) AS BIGINT) AS sv FROM e) "
        f"SELECT {group_col}, dim, "
        f"  CAST(SUM(sv) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * {scale}) AS centroid, "
        f"  COUNT(*) AS n "
        f"FROM x GROUP BY {group_col}, dim"
    )
