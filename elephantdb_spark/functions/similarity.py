"""Vector-similarity column math over `array<float|double>` embedding
columns. Left-to-right folds (`zip_with` + `aggregate`) so the floating
point result is bit-deterministic and replicable by an identical fold in
the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_sim_col(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = norm_col(a) * norm_col(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_col(a, b) / denom)
