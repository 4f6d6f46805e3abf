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
a sort-merge join but with zero pair blow-up. Caveat: the carry-forward
window partitions by KEY ALONE, and AQE skew splitting does NOT apply to
window functions — a celebrity key with 10⁸ rows becomes one straggler
task. For skewed key distributions pass ``time_bucket_width``: the
carry-forward then runs per (key, time-bucket) — bounded tasks — and a
second, bucket-summary-sized pass splices the last right value across
bucket boundaries. Right-side ties on (key, ts) are resolved before the
union by a deterministic tie-break so engines agree row-for-row.
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
    time_bucket_width: int | None = None,
) -> DataFrame:
    """Left as-of join (backward, inclusive): every ``left`` row, plus the
    ``value_cols`` of the latest ``right`` row with the same key and
    ``right_ts <= left_ts`` (nulls when no such row exists).

    ``tie_break``: when several right rows share (key, ts), the one with
    the greatest ``tie_break`` column wins (required for determinism if
    such ties exist; default keeps the greatest first value col).

    ``time_bucket_width`` (numeric timestamps only): the hot-key-safe
    plan. ``None`` keeps the single per-key window — simplest, but one
    task per key; a key holding a large fraction of all rows becomes a
    straggler that AQE cannot split (skew handling does not apply to
    window functions). With a width, the carry-forward window partitions
    by (key, floor(ts / width)) so no task exceeds one bucket, and the
    cross-bucket carry is computed on the bucket SUMMARY table (one row
    per non-empty (key, bucket) — smaller than the data by the bucket
    fan-in factor) then spliced back via an equi-join, which AQE *can*
    skew-split. Same results, bit for bit (property-tested); pick a width
    that keeps rows-per-(key,bucket) in the 10⁴–10⁶ range at your scale.
    """
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} collide with left columns — "
            "rename one side before joining"
        )
    tb = tie_break or value_cols[0]
    dedup_w = Window.partitionBy(right_key, right_ts).orderBy(F.col(tb).desc())
    right_one = (
        # SQL equality/inequality never matches NULL: a right row with a
        # NULL key or NULL ts can match no left row — drop them up front
        # (otherwise a NULL-ts row sorts first and its struct would be
        # carried into every left row of the key)
        right.filter(F.col(right_key).isNotNull() & F.col(right_ts).isNotNull())
        .select(right_key, right_ts, *value_cols)
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
    unioned = tagged_left.unionByName(tagged_right)

    if time_bucket_width is None:
        # right rows sort before left rows at equal ts (__side 0 < 1) →
        # "at-or-before" is inclusive
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.select(
            "*", F.last(F.col("__r"), ignorenulls=True).over(w).alias("__c")
        )
        return carried.filter(F.col("__side") == 1).select(
            *lcols, *[F.col(f"__c.{v}").alias(v) for v in value_cols]
        )

    if time_bucket_width <= 0:
        raise ValueError("time_bucket_width must be positive")
    bucketed = unioned.withColumn(
        "__b", F.floor(F.col("__ts") / F.lit(time_bucket_width))
    )
    # pass 1: carry WITHIN each (key, bucket) — task size bounded by the
    # bucket's row count, independent of how hot the key is
    w_in = (
        Window.partitionBy("__k", "__b")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bucket = bucketed.select(
        "*", F.last(F.col("__r"), ignorenulls=True).over(w_in).alias("__cin")
    )
    # pass 2: cross-bucket carry on the bucket SUMMARY — one row per
    # non-empty (key, bucket) of either side, so the per-key window here
    # processes #buckets rows, not #rows. (key,ts) is unique on the right
    # after the tie dedup, so max_by needs no further tie-break.
    last_per_bucket = (
        bucketed.filter(F.col("__side") == 0)
        .groupBy("__k", "__b")
        .agg(F.max_by("__r", "__ts").alias("__rlast"))
    )
    need = bucketed.select("__k", "__b").distinct()
    w_prev = (
        Window.partitionBy("__k")
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    summary = (
        need.join(last_per_bucket, ["__k", "__b"], "left")
        .select(
            "__k",
            "__b",
            F.last(F.col("__rlast"), ignorenulls=True).over(w_prev).alias("__cprev"),
        )
    )
    # splice: whole-struct coalesce (never mix fields of two right rows);
    # an AQE-skew-splittable equi-join, unlike the single-key window
    carried = in_bucket.join(summary, ["__k", "__b"], "left").withColumn(
        "__c", F.coalesce(F.col("__cin"), F.col("__cprev"))
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__c.{v}").alias(v) for v in value_cols]
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Interval-containment (range) join: each ``points`` row matched to
    the ``intervals`` rows of the same key with ``start <= ts < end``.

    Spark plans a raw inequality join as a broadcast nested loop (or worse,
    a cartesian product) — O(points x intervals) comparisons. This is the
    grid-bucket form: explode every interval into the fixed-width time
    buckets it overlaps, equi-join points on (key, bucket), then apply the
    exact containment predicate. Comparisons drop to points x
    intervals-per-bucket, and the join shuffles hash-partitioned like any
    equi-join (AQE skew splitting applies).

    ``bucket_width`` is in the timestamp's own unit; pick it near the
    median interval length (too small explodes the interval side, too
    large packs many intervals per bucket). Zero/negative-length intervals
    are dropped. Output: all point columns + all interval columns (minus
    the key); points contained by no interval are absent (inner-join
    semantics — union an anti-join for left semantics).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    b = F.lit(bucket_width)
    ivl_cols = [c for c in intervals.columns if c != interval_key]
    exploded = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / b),
                    # end is exclusive: an interval ending exactly on a
                    # bucket boundary does not reach into that bucket
                    F.floor((F.col(end_col) - 1) / b),
                )
            ),
        )
        .select(F.col(interval_key).alias("__ik"), "__bucket", *ivl_cols)
    )
    tagged = points.withColumn("__bucket", F.floor(F.col(point_ts) / b))
    contained = (F.col(start_col) <= F.col(point_ts)) & (
        F.col(point_ts) < F.col(end_col)
    )
    return (
        tagged.join(
            exploded,
            (tagged[point_key] == exploded["__ik"])
            & (tagged["__bucket"] == exploded["__bucket"]),
        )
        .filter(contained)
        .drop("__bucket", "__ik")
    )
