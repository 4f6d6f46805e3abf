"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The Spark-side machinery (schemas, batching, partitioning, UDF signatures)
is real and tested; the actual media decoding is STUBBED because no
image/audio library exists in this container — every stub raises
``NotImplementedError`` with a clear marker, and a deterministic fake
feature extractor stands in so the distributed plumbing is exercised
end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: canonical multimodal record schema: opaque payload + typed metadata
MULTIMODAL_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("media_type", StringType(), True),
                    StructField("lang", StringType(), True),
                    StructField("source", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "id long, n_bytes long, sig string, media_type string"


def attach_payload(
    df: DataFrame, id_col: str, text_col: str, lang_col: str, source_col: str
) -> DataFrame:
    """Derive a multimodal-shaped frame from a text table: payload = utf-8
    bytes, meta = typed struct. (Stand-in for real image/audio ingestion —
    the downstream plumbing is identical for any binary payload.)"""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.col(lang_col).alias("lang"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB — image decoding needs PIL/opencv, not present in this
    container. The mapInPandas pipeline calling this is real; swap this
    function for a real decoder on a cluster with the libs installed."""
    raise NotImplementedError(
        "STUB: image decode requires an imaging library not present in this "
        "environment; see operators/multimodal.py"
    )


def sample_frames(payload: bytes, every_n: int = 30) -> "list[object]":
    """STUB — video frame sampling (needs ffmpeg/av)."""
    raise NotImplementedError(
        "STUB: video frame sampling requires ffmpeg/av, not present here"
    )


def extract_features(mm_df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Deterministic feature extraction over binary payloads via
    Arrow-batched ``mapInPandas``: byte length + content signature (md5
    prefix). This is the real distributed shape of a decode/featurize
    stage — per-partition, batched, no driver involvement; the features
    are a deterministic fake standing in for the stubbed decoders."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                    "sig": payloads.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()[:8]
                    ),
                    "media_type": pdf["meta"].map(
                        lambda m: None if m is None else m["media_type"]
                    ),
                }
            )

    return mm_df.mapInPandas(featurize, FEATURE_SCHEMA)
