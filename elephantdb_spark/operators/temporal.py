"""Temporal joins Spark has no built-in operator for.

:func:`asof_join` — for every left row, the single most recent right row
of the same key at-or-before the left timestamp (``direction="backward"``,
the market-data / feature-lookup join). Spark offers no ASOF JOIN; the
naive formulation (inequality join + max-window or per-key argmax) builds
an O(left × right-per-key) intermediate. This implementation is the
union–carry-forward form:

    tag and union both sides → one shuffle on the key →
    sort by (ts, side) inside the window →
    last(right_value, ignorenulls) carries the newest right row forward →
    keep left rows.

Cost is one exchange of left+right and a per-key sort — the same shape as
a sort-merge join but with zero pair blow-up, and it degrades gracefully
under AQE skew splitting. Right-side ties on (key, ts) are resolved before
the union by a deterministic tie-break so engines agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join (backward, inclusive): every ``left`` row, plus the
    ``value_cols`` of the latest ``right`` row with the same key and
    ``right_ts <= left_ts`` (nulls when no such row exists).

    ``tie_break``: when several right rows share (key, ts), the one with
    the greatest ``tie_break`` column wins (required for determinism if
    such ties exist; default keeps the greatest first value col).
    """
    tb = tie_break or value_cols[0]
    dedup_w = Window.partitionBy(right_key, right_ts).orderBy(F.col(tb).desc())
    right_one = (
        right.select(right_key, right_ts, *value_cols)
        .withColumn("__rn", F.row_number().over(dedup_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    lcols = left.columns
    rtypes = dict(right_one.dtypes)
    struct_ddl = ", ".join(f"{v}: {rtypes[v]}" for v in value_cols)
    # carry ONE struct, not per-column values: a right row with a null
    # field must not be spliced with fields of an older right row
    tagged_left = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(f"struct<{struct_ddl}>").alias("__r"),
    )
    tagged_right = right_one.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        F.struct(*[F.col(v) for v in value_cols]).alias("__r"),
    )
    # right rows sort before left rows at equal ts (__side 0 < 1) →
    # "at-or-before" is inclusive
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*", F.last(F.col("__r"), ignorenulls=True).over(w).alias("__c")
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__c.{v}").alias(v) for v in value_cols]
    )
