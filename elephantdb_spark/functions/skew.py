"""Skew mitigation for joins on hot keys.

At 100 TB a handful of hot join keys turn one shuffle partition into a
straggler that dominates the stage. Two complementary answers, both used by
the engine:

* **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on in
  session.py): runtime splitting of oversized partitions — free, but only
  for sort-merge joins and only after the skewed shuffle files exist.
* **Explicit salting** (this module): split every hot left key into
  ``num_salts`` sub-keys and replicate the matching right rows, so the load
  lands on ``num_salts`` tasks by construction. Use when the skew is known
  (a power-law key like a null-bucket or a celebrity id) or when the join
  is broadcast-ineligible and AQE can't kick in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key_col: str, min_rows: int) -> list:
    """Keys whose row count exceeds ``min_rows`` — one aggregate with
    map-side combine, returns only the (small) hot-key list to the driver."""
    return [
        r[key_col]
        for r in df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_rows)
        .collect()
    ]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with a salted key: left rows get a deterministic salt in
    [0, num_salts); right rows are replicated once per salt value, so every
    (key, salt) partition carries ~1/num_salts of a hot key's rows.

    Semantics equal ``left.join(right, on, how)`` for how in
    {inner, left, left_outer}. The right side grows ×num_salts — prefer
    salting the *smaller* side as ``right``.

    NULL-key caveat: the salt hashes the WHOLE left row, so a left/left
    join where many ``on`` values are NULL spreads those rows across salts
    only as far as their other columns differ — identical full rows share
    one salt bucket. NULLs never match in the join anyway; if the skew IS
    a null bucket, filter the NULLs out, join the rest, and union the
    null rows back (cheaper than salting them through the join).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    # deterministic pseudo-random spread: hash of the whole left row
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts)
    ).cast("int")
    left_s = left.withColumn("__salt", salt)
    right_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return left_s.join(right_s, [on, "__salt"], how).drop("__salt")
