"""Table profiling — the per-column data-quality report a 100 TB ingest
starts with (null fractions, cardinalities, value ranges), in the spirit
of Deequ/Great-Expectations profilers but engine-native.

Reference provenance: the reference engine (nathanmarz/elephantdb) ships
key/value serving only; this extends the engine with the ingest-gate
profiling op a training-data pipeline needs, per the build brief.

Scale shape: ONE aggregation over a single scan. Every statistic is a
combinable aggregate, so the profile is map-side-partial at any corpus
size, and the output is columns-sized (tiny). ``exact_distinct=True``
plans Spark's multi-distinct Expand (one input-row replica per distinct
aggregate — the standard exact-cardinality cost); the default HLL++
sketch keeps the scan single-pass cheap at scale. The wide one-row
aggregate is unpivoted to long format with ``stack`` — plan-side, no
driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile: returns one row per column with

    * ``col_name`` — the column name;
    * ``n_rows`` — table row count (repeated per row for self-containment);
    * ``n_nulls`` — NULL count;
    * ``n_distinct`` — distinct non-null count (exact with
      ``exact_distinct=True``, else HLL++ approximate);
    * ``min_val`` / ``max_val`` — min/max rendered as strings (NULL for
      all-null columns). Deterministic for string/integer columns; float
      columns profile fine but their string rendering is engine-specific
      (keep them out of cross-engine comparisons).

    Ordered by ``col_name``.
    """
    if cols is None:
        cols = list(df.columns)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    distinct_of = (
        F.count_distinct if exact_distinct else F.approx_count_distinct
    )
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__nulls_{i}"),
            distinct_of(col).alias(f"__nd_{i}"),
            F.min(col).cast("string").alias(f"__min_{i}"),
            F.max(col).cast("string").alias(f"__max_{i}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{i}, __nd_{i}, __min_{i}, __max_{i}"
        for i, c in enumerate(cols)
    )
    return (
        wide.selectExpr(
            "__n_rows",
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_val, max_val)",
        )
        .select(
            "col_name",
            F.col("__n_rows").alias("n_rows"),
            F.col("n_nulls").cast("long").alias("n_nulls"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "min_val",
            "max_val",
        )
        .orderBy("col_name")
    )
