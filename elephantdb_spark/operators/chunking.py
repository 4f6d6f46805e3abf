"""Document chunking: fixed token windows with stride.

The pretraining/RAG chunking shape: split each document into windows of
``window`` tokens starting every ``stride`` tokens (overlapping when
``stride < window``, gapless partition when ``stride == window``); the
final window may be short. Extends the engine per the build brief (the
reference engine serves key/value only).

Scale shape: pure scan-stage expressions — tokenize once behind a
projection boundary, generate window starts with ``sequence``, and
``posexplode`` the chunk array. Zero shuffles; output volume is
``n_tokens / stride`` rows per doc, produced streaming inside the scan
task, never materialized per-doc on the driver. An exact SQL oracle
covers it (``generate_series`` + array slicing in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elephantdb_spark.functions.text import tokens_col


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 512,
    stride: int | None = None,
) -> DataFrame:
    """Split each document into token windows: chunk ``i`` covers tokens
    ``[i*stride, i*stride + window)`` (0-based), for every start strictly
    inside the document. Returns the input id plus ``chunk_idx``,
    ``chunk_text`` (space-rejoined tokens) and ``n_tokens`` (≤ window;
    the tail chunk may be short). Empty documents produce no chunks.

    ``stride`` defaults to ``window`` (non-overlapping partition of the
    token stream); ``stride < window`` gives overlapping context windows.
    """
    stride = window if stride is None else stride
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    toks = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
    )
    n = F.size(F.col("__toks"))
    starts = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), n, F.lit(stride))
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(F.col("__toks"), s, window)).alias("chunk_text"),
            F.least(F.lit(window), n - s + 1).cast("bigint").alias("n_tokens"),
        ),
    )
    return toks.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "__c")
    ).select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.n_tokens").alias("n_tokens"),
    )
