"""REAL MJPEG-in-AVI video: RIFF container walk + per-frame baseline JPEG
decode, pure stdlib+numpy (VERDICT r4 item 4 — closes the
codec-compressed-video stub for the one codec-compressed format the
existing pure-python codecs can already handle: AVI is RIFF, the container
the WAV path parses, and MJPEG frames are baseline JPEGs, which
operators/jpeg decodes).

This is the reference-extension multimodal surface (the reference itself
has no media layer; SURVEY §2 Part D E4): frame sampling for a
training-data pipeline that routes/filters on video content. Inter-frame
codecs (H.264 etc.) remain honestly stubbed in
multimodal.sample_frames — temporal prediction needs a real codec
library.

Layout notes (public AVI spec, msdn RIFF docs):

    RIFF <size> 'AVI '
      LIST <size> 'hdrl'
        'avih' <56>      main header: us/frame, total frames, dims, ...
        LIST <size> 'strl'
          'strh' <56>    fccType 'vids', fccHandler 'MJPG', scale/rate
          'strf' <40>    BITMAPINFOHEADER, biCompression 'MJPG'
      LIST <size> 'movi'
        '00dc' <n> <jpeg bytes> [pad]   one chunk per frame
    ('idx1' optional — the walk is linear, no seeking, so it is ignored)

Every chunk is word-aligned (odd sizes pad one byte) — getting this wrong
is the classic AVI-writer bug, and the parser enforces bounds so a
truncated/corrupt payload raises ValueError instead of reading garbage
(the malformed-input contract every codec in this package shares: a 100 TB
crawl always contains broken members, and they must skip, not fail tasks).
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MAGIC_RIFF = b"RIFF"
AVI_MAGIC_TYPE = b"AVI "

#: Maximum ``LIST rec `` nesting depth the movi walk will descend. Real
#: muxers emit exactly ONE level of interleave groups; a generous cap
#: turns an adversarial deeply-nested payload (each 12-byte header adds
#: a live generator — ~payload/12 of them, an executor-OOM shape) into
#: the contract's fail-fast ValueError instead.
AVI_MAX_REC_DEPTH = 1024


def is_avi(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == AVI_MAGIC_RIFF and payload[8:12] == AVI_MAGIC_TYPE


def _chunks(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each RIFF chunk in
    [pos, end); enforces bounds and word alignment."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated AVI chunk header")
        fourcc = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(f"AVI chunk {fourcc!r} overruns container")
        yield fourcc, body, body + size
        pos = body + size + (size & 1)  # word alignment


def _movi_frames(payload: bytes, pos: int, end: int) -> list[bytes]:
    """Collect video chunks from a movi body, descending into the
    ``LIST rec `` interleave groups standard muxers (VFW et al.) wrap
    around each frame — a flat walk would silently drop every frame of
    an interleaved AVI.

    Iterative (explicit stack of chunk walkers), so adversarially deep
    ``rec `` nesting cannot escape as RecursionError; depth is capped at
    :data:`AVI_MAX_REC_DEPTH` so a hostile payload of nothing but nested
    12-byte ``LIST rec `` headers (one live generator per level —
    unbounded memory at ~payload/12 levels) fails fast with the
    contract's ValueError instead of OOMing the executor."""
    out: list[bytes] = []
    stack = [_chunks(payload, pos, end)]
    while stack:
        try:
            fourcc, s, e = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if fourcc == b"LIST" and e - s >= 4 and payload[s:s + 4] == b"rec ":
            if len(stack) >= AVI_MAX_REC_DEPTH:
                raise ValueError(
                    f"AVI 'rec ' nesting exceeds {AVI_MAX_REC_DEPTH} levels"
                )
            stack.append(_chunks(payload, s + 4, end=e))
        elif fourcc[2:4] in (b"dc", b"db"):
            # '##dc' compressed / '##db' uncompressed video chunks
            out.append(payload[s:e])
    return out


def parse_avi(payload: bytes) -> dict:
    """Container parse: main-header metadata + the raw video-frame chunk
    payloads (undecoded). Raises ValueError on malformed input."""
    if not is_avi(payload):
        raise ValueError("not an AVI payload (missing RIFF/AVI magic)")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_size, len(payload))
    if 8 + riff_size > len(payload):
        raise ValueError("AVI RIFF size overruns payload")
    meta = {
        "width": None, "height": None, "n_frames": None,
        "us_per_frame": None, "handler": None,
    }
    frames: list[bytes] = []
    for fourcc, s, e in _chunks(payload, 12, end):
        if fourcc != b"LIST" or e - s < 4:
            continue
        ltype = payload[s:s + 4]
        if ltype == b"hdrl":
            for f2, s2, e2 in _chunks(payload, s + 4, e):
                if f2 == b"avih":
                    if e2 - s2 < 40:
                        raise ValueError("truncated avih header")
                    vals = struct.unpack_from("<10I", payload, s2)
                    meta["us_per_frame"] = vals[0]
                    meta["n_frames"] = vals[4]
                    meta["width"] = vals[8]
                    meta["height"] = vals[9]
                elif f2 == b"LIST" and payload[s2:s2 + 4] == b"strl":
                    for f3, s3, e3 in _chunks(payload, s2 + 4, e2):
                        if f3 == b"strh" and e3 - s3 >= 8:
                            if payload[s3:s3 + 4] == b"vids":
                                meta["handler"] = payload[s3 + 4:s3 + 8].decode(
                                    "ascii", "replace"
                                )
        elif ltype == b"movi":
            frames.extend(_movi_frames(payload, s + 4, e))
    if meta["n_frames"] is None:
        raise ValueError("AVI has no avih main header")
    meta["frame_chunks"] = frames
    return meta


def decode_avi_mjpeg_frames(
    payload: bytes, every_n: int = 1
) -> list[np.ndarray]:
    """Decode every ``every_n``-th video chunk as a baseline JPEG →
    (h, w, c) uint8 arrays (MJPEG frames are independent, so only the
    sampled chunks are decoded — never pay N Huffman+IDCT decodes for
    N/every_n outputs). A well-formed AVI carrying a non-JPEG codec
    raises NotImplementedError — the honest-stub contract (same as
    H.264-in-MP4), distinct from ValueError = malformed bytes; a caller
    routing NotImplementedError to an ffmpeg fallback must not be told
    the file is corrupt."""
    from elephantdb_spark.operators.jpeg import decode_jpeg_pixels

    info = parse_avi(payload)
    out = []
    for chunk in info["frame_chunks"][::every_n]:
        if chunk[:2] != b"\xff\xd8":
            raise NotImplementedError(
                f"STUB: AVI video chunk is not MJPEG (handler "
                f"{info['handler']!r}) — inter-frame codecs need ffmpeg"
            )
        out.append(decode_jpeg_pixels(chunk))
    return out


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 25, quality: int = 85
) -> bytes:
    """Serialize frames as an MJPEG AVI (the fixture generator driving the
    REAL parse/decode path — q99, tests — without media files). Every
    frame is independently baseline-JPEG-encoded (that IS the MJPEG
    codec: no temporal prediction)."""
    from elephantdb_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    bufsize = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps, bufsize * fps, 0, 0,  # no idx1 → AVIF_HASINDEX off
        len(frames), 0, 1, bufsize, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIii", 0, 0, 0, 0, 1, fps, 0, len(frames), bufsize, -1, 0
        )
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = AVI_MAGIC_TYPE + hdrl + movi
    return AVI_MAGIC_RIFF + struct.pack("<I", len(body)) + body


def synth_avi(width: int, height: int, n_frames: int, fps: int = 25) -> bytes:
    """Deterministic multi-frame MJPEG AVI: smooth gradients (JPEG-friendly
    — blocky noise would not survive the lossy round trip) that shift per
    frame so frames are distinguishable after decode."""
    ys, xs = np.mgrid[0:height, 0:width]
    frames = []
    for i in range(n_frames):
        arr = np.stack(
            [
                np.clip(xs * 3 + i * 16, 0, 255),
                np.clip(ys * 3 + i * 8, 0, 255),
                np.clip((xs + ys) * 2, 0, 255),
            ],
            -1,
        ).astype(np.uint8)
        frames.append(arr)
    return encode_avi_mjpeg(frames, fps=fps)
