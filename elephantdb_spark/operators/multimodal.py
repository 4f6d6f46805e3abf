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


FRAME_SCHEMA = "id long, frame_idx int, frame_sig string"

RESIZE_SCHEMA = "id long, payload binary, width int, height int, media_type string"


def sample_frames_df(
    mm_df: DataFrame, every_n: int = 30, use_real_decoder: bool = False
) -> DataFrame:
    """Video frame sampling as a row-exploding ``mapInPandas`` stage: each
    payload yields one output row per sampled frame (the 1→N shape a real
    ffmpeg pipeline has). Frame count is a deterministic fake
    (``n_bytes // 64`` "frames"); frame signatures hash (payload, idx).
    ``use_real_decoder=True`` routes through the stubbed :func:`sample_frames`
    and raises — the documented extension point."""

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for _id, payload in zip(pdf["id"], pdf["payload"]):
                if use_real_decoder:
                    sample_frames(payload, every_n)  # raises NotImplementedError
                data = payload or b""
                n_frames = len(data) // 64
                for fi in range(0, n_frames, every_n):
                    ids.append(_id)
                    idxs.append(fi)
                    sigs.append(
                        hashlib.md5(data + fi.to_bytes(4, "big")).hexdigest()[:8]
                    )
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_sig": sigs})

    return mm_df.mapInPandas(explode_frames, FRAME_SCHEMA)


def resize_images(
    mm_df: DataFrame,
    width: int = 224,
    height: int = 224,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Image resize as a payload→payload ``mapInPandas`` stage (decode →
    resize → re-encode in a real pipeline). The fake deterministically
    re-encodes the payload as md5-keyed bytes of length width*height//64 so
    output sizing is shape-faithful; the real decoder hook is the stub."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_len = max(1, width * height // 64)
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                if use_real_decoder:
                    decode_image(payload)  # raises NotImplementedError
                seed = hashlib.md5(payload or b"").digest()
                reps = out_len // len(seed) + 1
                payloads.append((seed * reps)[:out_len])
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                    "media_type": pdf["meta"].map(
                        lambda m: None if m is None else m["media_type"]
                    ),
                }
            )

    return mm_df.mapInPandas(resize, RESIZE_SCHEMA)
