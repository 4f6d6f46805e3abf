"""Streaming deduplication — the continuous twin of
:func:`elephantdb_spark.operators.dedup.exact_dedup`.

A training-data ingest stream re-delivers documents (at-least-once sources,
crawler revisits, producer retries). Two built-in strategies cover it
without custom state:

* :func:`dedup_stream` — exact key dedup with
  ``dropDuplicatesWithinWatermark``: state holds one entry per key seen
  within the watermark horizon, so memory is bounded by the horizon rather
  than the stream's lifetime. The right default for "drop retransmits".
* :func:`dedup_stream_forever` — plain ``dropDuplicates`` on the stream:
  exact forever-dedup, state grows with distinct keys (only for bounded key
  domains; Spark keeps it in the checkpointed state store).

Both shuffle once on the dedup key — identical to the batch operator's
shape — and compose with any sink, including the micro-batch domain
updater (streaming/updater.stream_build).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list[str],
    event_time_col: str,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same key arriving within
    ``watermark_delay`` of first sight. State is bounded: entries expire
    once the watermark passes them.

    ``event_time_col`` must be a timestamp column; it anchors the watermark
    that both admits late data and expires dedup state.
    """
    return stream_df.withWatermark(
        event_time_col, watermark_delay
    ).dropDuplicatesWithinWatermark(key_cols)


def dedup_stream_forever(
    stream_df: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Exact dedup across the whole stream lifetime (unbounded state —
    use only when the distinct-key domain is bounded)."""
    return stream_df.dropDuplicates(key_cols)
