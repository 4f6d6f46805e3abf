"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The Spark-side machinery (schemas, batching, partitioning, UDF signatures)
is real and tested, and so is the decoding — no imaging/codec libraries,
pure stdlib + numpy throughout:

* WAV/PCM audio (:func:`decode_wav`, stdlib wave);
* uncompressed 24-bit BMP (:func:`decode_bmp` + real nearest-neighbor
  resize);
* 8-bit non-interlaced PNG (:func:`decode_png` /
  :func:`_decode_png_pixels`: zlib inflate + full scanline unfiltering
  incl. Paeth; encode + resize too);
* baseline JPEG (:mod:`~elephantdb_spark.operators.jpeg`: marker parse,
  Annex-K Huffman entropy decode, dequant + orthonormal IDCT, YCbCr;
  encoder + resize too — 4:4:4 subset, others raise ValueError);
* MP4 container metadata (:func:`decode_mp4`: box-tree walk for
  duration/tracks/dimensions);
* animated GIF (:mod:`~elephantdb_spark.operators.gif`: real
  variable-width LZW both directions), which makes video FRAME SAMPLING
  real — :func:`sample_frames` / :func:`sample_frames_df` extract actual
  every-n-th frames from GIF payloads.

The ONLY remaining stub is codec-compressed video frame decode
(MP4/H.264 inside :func:`sample_frames` — needs a real codec suite),
where a clear ``NotImplementedError`` marker plus a deterministic fake
keep the distributed plumbing exercised end-to-end.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
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


PNG_SIG = b"\x89PNG\r\n\x1a\n"

_GIF_MAGICS = (b"GIF87a", b"GIF89a")

#: color type -> channel count for the supported 8-bit-depth subset
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_COLOR_FOR_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def _png_chunks(payload: bytes):
    """Yield (type, data) PNG chunks with length and CRC validation —
    attacker-shaped bytes raise ValueError, never escape as slicing
    surprises."""
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        end = pos + 8 + length
        if length > len(payload) or end + 4 > len(payload):
            raise ValueError("truncated PNG chunk")
        data = payload[pos + 8:end]
        (crc,) = struct.unpack_from(">I", payload, end)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        yield ctype, data
        if ctype == b"IEND":
            return
        pos = end + 4
    raise ValueError("PNG stream ended without IEND")


def _png_ihdr(payload: bytes) -> tuple:
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    for ctype, data in _png_chunks(payload):
        if ctype != b"IHDR":
            raise ValueError("first PNG chunk is not IHDR")
        if len(data) != 13:
            raise ValueError("bad IHDR length")
        return struct.unpack(">IIBBBBB", data)
    raise ValueError("missing IHDR")


def decode_png(payload: bytes) -> dict:
    """REAL PNG header decode (pure struct + CRC check): width/height/
    bit depth/color type/channels. Works for any well-formed PNG; pixel
    access for the 8-bit non-interlaced subset is
    :func:`_decode_png_pixels`."""
    w, h, depth, color, comp, filt, interlace = _png_ihdr(payload)
    return {
        "width": w,
        "height": h,
        "bit_depth": depth,
        "color_type": color,
        "n_channels": _PNG_CHANNELS.get(color),
        "interlaced": bool(interlace),
    }


def _decode_png_pixels(payload: bytes) -> "np.ndarray":
    """REAL PNG pixel decode (stdlib zlib, no imaging libs): 8-bit-depth,
    non-interlaced gray / gray+alpha / RGB / RGBA → (h, w, c) uint8, with
    full scanline unfiltering (None/Sub/Up/Average/Paeth)."""
    w, h, depth, color, comp, filt, interlace = _png_ihdr(payload)
    if depth != 8 or color not in _PNG_CHANNELS or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"only 8-bit non-interlaced gray/RGB/alpha PNG supported "
            f"(depth={depth} color={color} interlace={interlace})"
        )
    c = _PNG_CHANNELS[color]
    idat = b"".join(d for t, d in _png_chunks(payload) if t == b"IDAT")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as exc:
        raise ValueError(f"bad PNG IDAT stream: {exc}") from exc
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size does not match dimensions")
    out = np.empty((h, stride), dtype=np.uint8) if h else np.zeros((0, stride), np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        if f == 0:
            pass
        elif f == 2:  # Up — uint8 addition wraps mod 256, per spec
            row += prev
        elif f == 1:
            # Sub is a per-channel-lane prefix sum mod 256 — fully
            # vectorized (the per-byte python loop was ~100x slower on
            # real third-party PNGs, which rarely use filter 0)
            row = (
                row.reshape(-1, c).astype(np.int64).cumsum(axis=0) % 256
            ).astype(np.uint8).reshape(-1)
        elif f == 3:  # Average — sequential in x; plain-int list loop
            r = row.tolist()
            pv = prev.tolist()
            for i in range(stride):
                left = r[i - c] if i >= c else 0
                r[i] = (r[i] + ((left + pv[i]) >> 1)) & 0xFF
            row = np.array(r, dtype=np.uint8)
        elif f == 4:  # Paeth — sequential in x; plain-int list loop
            r = row.tolist()
            pv = prev.tolist()
            for i in range(stride):
                a = r[i - c] if i >= c else 0
                b = pv[i]
                cc = pv[i - c] if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                r[i] = (r[i] + pred) & 0xFF
            row = np.array(r, dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = row
        prev = row
    return out.reshape(h, w, c)


def _encode_png(arr: "np.ndarray") -> bytes:
    """(h, w, c) uint8 (c in 1/2/3/4) → PNG bytes: filter-0 scanlines,
    one zlib IDAT, correct CRCs. Round-trips through
    :func:`_decode_png_pixels` bit-exactly."""
    if arr.ndim != 3 or arr.shape[2] not in _PNG_COLOR_FOR_CHANNELS:
        raise ValueError(f"need (h, w, c) uint8 with c in 1/2/3/4, got {arr.shape}")
    h, w, c = arr.shape
    arr = arr.astype(np.uint8, copy=False)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_COLOR_FOR_CHANNELS[c], 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    idat = zlib.compress(raw)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def synth_png(width: int, height: int, n_channels: int = 3) -> bytes:
    """Deterministic gradient PNG — the ingestion-side fixture generator
    for driving the REAL decode path (q92, tests) without external media
    files. Pixel (y, x, ch) = (x + 2*y + 17*ch) mod 256."""
    ys = np.arange(height, dtype=np.int64)[:, None, None]
    xs = np.arange(width, dtype=np.int64)[None, :, None]
    cs = np.arange(n_channels, dtype=np.int64)[None, None, :]
    return _encode_png(((xs + 2 * ys + 17 * cs) % 256).astype(np.uint8))


def _resize_jpeg(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of a baseline 4:4:4 JPEG: full
    entropy decode → index-sample → re-encode (operators/jpeg)."""
    from elephantdb_spark.operators.jpeg import decode_jpeg_pixels, encode_jpeg

    arr = decode_jpeg_pixels(payload)
    h, w, _ = arr.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return encode_jpeg(arr[ys][:, xs])


def _resize_png(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of a supported PNG: decode →
    index-sample → re-encode (stdlib zlib + numpy)."""
    arr = _decode_png_pixels(payload)
    h, w, _ = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty PNG")
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return _encode_png(arr[ys][:, xs])


def decode_jpeg(payload: bytes) -> dict:
    """REAL baseline JPEG header decode (operators/jpeg — pure numpy
    marker walk): width/height/components. Pixel access for the baseline
    4:4:4 subset is :func:`jpeg.decode_jpeg_pixels`."""
    from elephantdb_spark.operators.jpeg import decode_jpeg_header

    info = decode_jpeg_header(payload)
    return {
        "width": info["width"],
        "height": info["height"],
        "n_channels": info["n_components"],
        "bit_depth": info["bit_depth"],
        "baseline": info["baseline"],
    }


def decode_image(payload: bytes) -> dict:
    """Image decode: REAL for uncompressed BMP (pure struct/numpy —
    :func:`decode_bmp`), PNG (stdlib zlib + scanline unfiltering —
    :func:`decode_png`), and baseline JPEG (pure-numpy Huffman + IDCT —
    :mod:`~elephantdb_spark.operators.jpeg`). No image-format stubs
    remain; unrecognized magic raises ``NotImplementedError`` as the
    extension point for exotic formats."""
    if payload and payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload and payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload and payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload and bytes(payload[:6]) in _GIF_MAGICS:
        from elephantdb_spark.operators.gif import decode_gif_header

        return decode_gif_header(bytes(payload))
    raise NotImplementedError(
        "unrecognized image format (BMP, PNG, and baseline JPEG decode "
        "natively here; see operators/multimodal.py)"
    )


def _mp4_boxes(payload: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) ISO-BMFF boxes in
    [start, end). Malformed sizes raise ValueError."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, pos)
        btype = payload[pos + 4:pos + 8]
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
            header = 8
        else:
            header = 8
        if size < header or pos + size > end:
            raise ValueError(f"bad MP4 box size {size} for {btype!r}")
        yield btype, pos + header, pos + size
        pos += size
    if pos != end:
        raise ValueError("trailing bytes after last MP4 box")


def decode_mp4(payload: bytes) -> dict:
    """REAL MP4/ISO-BMFF container metadata parse (pure struct, no codec):
    walks the box tree for ``moov/mvhd`` (timescale + duration) and
    ``moov/trak/tkhd`` (track count, presentation width/height from the
    first visual track). Frame/sample DECODE stays stubbed
    (:func:`sample_frames` — needs a codec library); the container layer
    a real pipeline filters/routes on is parsed for real."""
    if len(payload) < 8 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload (missing ftyp)")
    timescale = duration = None
    n_tracks = 0
    width = height = None
    for btype, s, e in _mp4_boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ityp, is_, ie in _mp4_boxes(payload, s, e):
            if ityp == b"mvhd" and ie - is_ >= 1:
                version = payload[is_]
                # v1 has 64-bit ctime/mtime/duration: timescale@20 +
                # duration@24 needs 32 body bytes; v0 needs 20. A
                # truncated box must raise, not unpack_from bytes of the
                # next sibling via the absolute offsets.
                need = 32 if version == 1 else 20
                if ie - is_ < need:
                    raise ValueError(
                        f"truncated mvhd v{version}: {ie - is_} < {need} bytes"
                    )
                if version == 1:
                    (timescale,) = struct.unpack_from(">I", payload, is_ + 20)
                    (duration,) = struct.unpack_from(">Q", payload, is_ + 24)
                else:
                    (timescale,) = struct.unpack_from(">I", payload, is_ + 12)
                    (duration,) = struct.unpack_from(">I", payload, is_ + 16)
            elif ityp == b"trak":
                n_tracks += 1
                for ttyp, ts, te in _mp4_boxes(payload, is_, ie):
                    if ttyp == b"tkhd" and width is None:
                        # v1 tkhd has 64-bit ctime/mtime/duration, so the
                        # dims sit 12 bytes later (offset 88 vs 76) — at
                        # the v0 offset they'd read matrix garbage
                        tkhd_v = payload[ts] if te > ts else 0
                        dims_off, min_len = (88, 96) if tkhd_v == 1 else (76, 84)
                        if te - ts < min_len:
                            continue
                        w_fp, h_fp = struct.unpack_from(
                            ">II", payload, ts + dims_off
                        )
                        if w_fp and h_fp:  # 16.16 fixed point; 0 = non-visual
                            width, height = w_fp >> 16, h_fp >> 16
    if timescale is None:
        raise ValueError("MP4 has no moov/mvhd")
    duration_ms = int(duration * 1000 // timescale) if timescale else 0
    return {
        "timescale": timescale,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }


def synth_mp4(
    duration_ms: int, width: int = 0, height: int = 0, timescale: int = 1000
) -> bytes:
    """Deterministic minimal MP4 (ftyp + moov{mvhd, trak{tkhd}}) — the
    fixture generator for driving the REAL container parse (q93, tests)
    without media files. ``width``/``height`` of 0 emits a non-visual
    track (tkhd dims zero), matching the spec's audio-track convention."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    dur = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, dur) + b"\x00" * 80,
    )
    tkhd_body = (
        struct.pack(">BxxxIIIxxxxI", 0, 0, 0, 1, dur)
        + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16)
    )
    trak = box(b"trak", box(b"tkhd", tkhd_body))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + box(
        b"moov", mvhd + trak
    )


def sample_frames(payload: bytes, every_n: int = 30) -> "list[object]":
    """Video frame sampling: REAL for animated GIF (operators/gif — LZW
    decode) and MJPEG-in-AVI (operators/avi — RIFF walk, each frame a
    baseline JPEG through operators/jpeg); every_n-th frame as an
    (h, w, c) uint8 array. Inter-frame codecs (H.264/VP9 etc. —
    temporal prediction needs a real codec library) route to a
    registry-resolved backend (``registry.resolve_video_decoder`` —
    ffmpeg CLI when present, operators/video_ffmpeg); when NO backend's
    dependency is available the honest STUB ``NotImplementedError``
    remains (r6 — the error now fires only when no backend exists)."""
    if payload and bytes(payload[:6]) in _GIF_MAGICS:
        from elephantdb_spark.operators.gif import decode_gif_frames

        return decode_gif_frames(bytes(payload))[::every_n]
    if payload:
        from elephantdb_spark.operators.avi import (
            decode_avi_mjpeg_frames,
            is_avi,
        )

        if is_avi(bytes(payload)):
            return decode_avi_mjpeg_frames(bytes(payload), every_n)
    from elephantdb_spark.registry import resolve_video_decoder

    backend = resolve_video_decoder()
    if backend is not None:
        return backend(bytes(payload or b""), every_n)
    raise NotImplementedError(
        "STUB: inter-frame codec video (H.264/VP9/...) needs an ffmpeg "
        "backend (registry.register_video_decoder), none available here "
        "(animated GIF and MJPEG AVI decode natively)"
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
                elif data[:8] == PNG_SIG:
                    try:
                        png = decode_png(data)
                        row["width"] = png["width"]
                        row["height"] = png["height"]
                        row["n_channels"] = png["n_channels"]
                    except Exception:
                        pass  # malformed PNG: keep the baseline features
                elif data[4:8] == b"ftyp":
                    try:
                        mp4 = decode_mp4(data)
                        row["duration_ms"] = mp4["duration_ms"]
                        row["width"] = mp4["width"]
                        row["height"] = mp4["height"]
                    except Exception:
                        pass  # malformed MP4: keep the baseline features
                elif data[:2] == b"\xff\xd8":
                    try:
                        jpg = decode_jpeg(data)
                        row["width"] = jpg["width"]
                        row["height"] = jpg["height"]
                        row["n_channels"] = jpg["n_channels"]
                    except Exception:
                        pass  # malformed JPEG: keep the baseline features
                elif data[:6] in _GIF_MAGICS:
                    try:
                        from elephantdb_spark.operators.gif import (
                            decode_gif_header,
                        )

                        gif = decode_gif_header(data)
                        row["width"] = gif["width"]
                        row["height"] = gif["height"]
                    except Exception:
                        pass  # malformed GIF: keep the baseline features
                elif data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                    try:
                        from elephantdb_spark.operators.avi import parse_avi

                        avi = parse_avi(data)
                        row["width"] = avi["width"]
                        row["height"] = avi["height"]
                        if avi["us_per_frame"]:
                            row["duration_ms"] = (
                                avi["n_frames"] * avi["us_per_frame"] // 1000
                            )
                    except Exception:
                        pass  # malformed AVI: keep the baseline features
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
    ffmpeg pipeline has). GIF and MJPEG-AVI payloads decode for REAL
    (frame signatures hash the decoded pixels); other formats fall back
    to a deterministic fake frame count (``n_bytes // 64``) unless
    ``use_real_decoder=True``, which routes them through the
    inter-frame-codec stub in :func:`sample_frames` and raises — the
    documented extension point."""

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from elephantdb_spark.operators.avi import (
            decode_avi_mjpeg_frames,
            is_avi,
        )
        from elephantdb_spark.operators.gif import decode_gif_frames

        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for _id, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if data[:6] in _GIF_MAGICS or is_avi(data):
                    # REAL frame extraction, every_n-th frame. GIF must
                    # decode ALL frames (LZW state chains frame to
                    # frame); MJPEG frames are independent, so the AVI
                    # path decodes ONLY the sampled chunks.
                    try:
                        if is_avi(data):
                            sampled = decode_avi_mjpeg_frames(data, every_n)
                            frames = [
                                (i * every_n, f) for i, f in enumerate(sampled)
                            ]
                        else:
                            frames = list(
                                enumerate(decode_gif_frames(data))
                            )[::every_n]
                    except ValueError:
                        # malformed bytes: corrupt payloads skip to the
                        # fake-frame fallback unless the caller demanded
                        # real decode
                        if use_real_decoder:
                            raise
                        frames = None
                    except NotImplementedError:
                        # well-formed file, unsupported codec (the honest
                        # stub): same routing as the sample_frames stub
                        if use_real_decoder:
                            raise
                        frames = None
                    if frames is not None:
                        for fi, frame in frames:
                            ids.append(_id)
                            idxs.append(fi)
                            sigs.append(
                                hashlib.md5(frame.tobytes()).hexdigest()[:8]
                            )
                        continue
                if use_real_decoder:
                    sample_frames(data, every_n)  # raises for codec video
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
    (nearest-neighbor via :func:`_resize_bmp24`), 8-bit non-interlaced
    PNG (:func:`_resize_png`), and baseline 4:4:4 JPEG
    (:func:`_resize_jpeg` — full entropy decode, sample, re-encode);
    other payloads get a deterministic fake re-encoding (md5-keyed bytes
    of length width*height//64, shape-faithful sizing).
    ``use_real_decoder=True`` forces :func:`decode_image` on every
    payload — BMP/PNG/JPEG decode, anything else raises the documented
    ``NotImplementedError`` marker."""

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
                elif data[:8] == PNG_SIG:
                    try:
                        payloads.append(_resize_png(data, width, height))
                        continue
                    except (ValueError, struct.error):
                        # unsupported subset (16-bit/palette/interlaced) or
                        # malformed stream: fall back to the fake re-encode
                        pass
                elif data[:2] == b"\xff\xd8":
                    try:
                        payloads.append(_resize_jpeg(data, width, height))
                        continue
                    except (ValueError, struct.error):
                        # outside the baseline 4:4:4 subset or malformed:
                        # fall back to the fake re-encode
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
