"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The Spark-side machinery (schemas, batching, partitioning, UDF signatures)
is real and tested. Decoding is REAL for formats the standard library +
numpy can parse — WAV/PCM audio (:func:`decode_wav`) and uncompressed
24-bit BMP images (:func:`decode_bmp`, including a real nearest-neighbor
resize) — and STUBBED only for codec-dependent formats (JPEG/PNG/MP4),
where the stub raises ``NotImplementedError`` with a clear marker and a
deterministic fake stands in so the distributed plumbing is exercised
end-to-end either way.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
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


def decode_wav(payload: bytes) -> dict:
    """REAL WAV/PCM decode (stdlib ``wave`` + numpy, no external codecs):
    returns channel count, sample rate/width, frame count, duration, and
    the peak absolute sample amplitude. Malformed payloads raise
    ``ValueError`` — the stdlib parser's zoo of failure types
    (wave.Error, EOFError, even bare RuntimeError from the chunk reader,
    found by fuzzing) is normalized so callers have one clean contract."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n_channels = w.getnchannels()
            samp_width = w.getsampwidth()
            rate = w.getframerate()
            n_frames = w.getnframes()
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError, RuntimeError, struct.error) as exc:
        raise ValueError(f"malformed WAV payload: {exc!r}") from exc
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(samp_width)
    peak = 0
    if dtype is not None and frames:
        samples = np.frombuffer(frames, dtype=dtype)
        if samples.size:
            if dtype is np.uint8:  # 8-bit WAV is unsigned, centered at 128
                peak = int(np.max(np.abs(samples.astype(np.int16) - 128)))
            else:
                peak = int(np.max(np.abs(samples.astype(np.int64))))
    return {
        "n_channels": n_channels,
        "sample_width": samp_width,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 // rate) if rate else 0,
        "peak": peak,
    }


def synth_wav(n_frames: int, rate: int = 8000, n_channels: int = 1) -> bytes:
    """Deterministic silent PCM16 WAV of ``n_frames`` frames — the
    ingestion-side fixture generator for driving the REAL decode path
    (q76, tests) without external media files."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * (n_frames * n_channels))
    return buf.getvalue()


def decode_bmp(payload: bytes) -> dict:
    """REAL BMP header decode (pure struct): width/height/bpp."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    return {"width": width, "height": abs(height), "bpp": bpp}


def _decode_bmp24_pixels(payload: bytes) -> "np.ndarray":
    """Uncompressed 24-bit BMP → (h, w, 3) uint8 array, top-down BGR."""
    (offset,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24bpp BMP supported, got bpp={bpp} comp={comp}")
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = [
        np.frombuffer(
            payload, dtype=np.uint8, count=w * 3, offset=offset + y * row_size
        ).reshape(w, 3)
        for y in range(h)
    ]
    arr = np.stack(rows) if rows else np.zeros((0, 0, 3), dtype=np.uint8)
    return arr if top_down else arr[::-1]


def _encode_bmp24(arr: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 top-down BGR → uncompressed 24-bit BMP bytes."""
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (row_size - w * 3)
    body = b"".join(arr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    return header + info + body


def decode_image(payload: bytes) -> dict:
    """Image decode: REAL for uncompressed BMP (pure struct/numpy —
    :func:`decode_bmp`); STUB for codec-dependent formats (JPEG/PNG need
    an imaging library not present in this container). The mapInPandas
    pipelines calling this are real either way; swap in a full decoder on
    a cluster with the libs installed."""
    if payload and payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "STUB: non-BMP image decode requires an imaging library not present "
        "in this environment; see operators/multimodal.py"
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


MEDIA_FEATURE_SCHEMA = (
    "id long, media_type string, n_bytes long, sig string, width long, "
    "height long, n_channels long, sample_rate long, duration_ms long"
)


def extract_media_features(mm_df: DataFrame) -> DataFrame:
    """Format-dispatching feature extraction over binary payloads via
    Arrow-batched ``mapInPandas``: WAV payloads (RIFF/WAVE magic) get REAL
    audio properties (channels, rate, duration), BMP payloads get REAL
    image dimensions; everything else gets the size+signature baseline
    with null media fields. One pass, per-partition, no driver involvement
    — the production decode/featurize stage shape with real decoders where
    the container allows them."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "media_type", "n_bytes", "sig", "width", "height",
                "n_channels", "sample_rate", "duration_ms",
            )}
            for _id, payload, meta in zip(pdf["id"], pdf["payload"], pdf["meta"]):
                data = payload or b""
                row = dict.fromkeys(out)
                row["id"] = _id
                row["media_type"] = None if meta is None else meta["media_type"]
                row["n_bytes"] = len(data)
                row["sig"] = hashlib.md5(data).hexdigest()[:8]
                if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                    try:
                        wav = decode_wav(data)
                        row["n_channels"] = wav["n_channels"]
                        row["sample_rate"] = wav["sample_rate"]
                        row["duration_ms"] = wav["duration_ms"]
                    except Exception:
                        pass  # malformed RIFF: keep the baseline features
                elif data[:2] == b"BM":
                    try:
                        bmp = decode_bmp(data)
                        row["width"] = bmp["width"]
                        row["height"] = bmp["height"]
                    except Exception:
                        pass
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return mm_df.mapInPandas(featurize, MEDIA_FEATURE_SCHEMA)


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


def _resize_bmp24(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of an uncompressed 24-bit BMP:
    decode → index-sample → re-encode (pure numpy)."""
    arr = _decode_bmp24_pixels(payload)
    h, w, _ = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty BMP")
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return _encode_bmp24(arr[ys][:, xs])


def resize_images(
    mm_df: DataFrame,
    width: int = 224,
    height: int = 224,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Image resize as a payload→payload ``mapInPandas`` stage (decode →
    resize → re-encode). REAL for uncompressed 24-bit BMP payloads
    (nearest-neighbor via :func:`_resize_bmp24`); other formats get a
    deterministic fake re-encoding (md5-keyed bytes of length
    width*height//64, shape-faithful sizing). ``use_real_decoder=True``
    forces :func:`decode_image` on every payload — BMPs decode, anything
    else raises the documented ``NotImplementedError`` stub."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_len = max(1, width * height // 64)
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                if use_real_decoder:
                    decode_image(payload)  # raises for non-BMP formats
                data = payload or b""
                if data[:2] == b"BM":
                    try:
                        payloads.append(_resize_bmp24(data, width, height))
                        continue
                    except (ValueError, struct.error):
                        # non-24bpp/compressed/truncated BMP (struct.error =
                        # header shorter than its fixed offsets): fall back
                        # to the fake re-encode instead of failing the task
                        pass
                seed = hashlib.md5(data).digest()
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
