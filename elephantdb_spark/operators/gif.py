"""GIF codec in pure python/numpy — no imaging libraries.

Supported subset (declared; outside it raises ``ValueError``): GIF87a/89a
with a global color table, full-canvas frames (image descriptor covers
the whole logical screen), no local color tables, no interlace, no
transparency compositing — each frame decodes independently against the
global palette. This covers exactly what :func:`encode_gif` emits plus
the common single-frame and simple-animation cases, and it makes video
FRAME SAMPLING real: an animated GIF is a genuine multi-frame video
container the multimodal pipeline can decode frame-by-frame
(multimodal.sample_frames_df), where MP4 frame decode would need a
codec suite the environment lacks.

The LZW implementation is the real variable-code-width algorithm
(ITU/CompuServe spec): LSB-first bit packing, clear/EOI codes, dict
growth to 4096 with reset — both directions, round-trip tested.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# --- LZW ------------------------------------------------------------------

def lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    """Decode a GIF LZW stream into index bytes (at most ``max_pixels`` —
    a bound, not a target; excess output raises)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    # buffered LSB-first reader: O(1) int ops per code, not per bit
    buf = 0
    nbuf = 0
    bytepos = 0

    def read_code(width: int) -> int:
        nonlocal buf, nbuf, bytepos
        while nbuf < width:
            if bytepos >= len(data):
                raise ValueError("LZW stream exhausted")
            buf |= data[bytepos] << nbuf
            bytepos += 1
            nbuf += 8
        v = buf & ((1 << width) - 1)
        buf >>= width
        nbuf -= width
        return v

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1, None

    table, width, prev = reset()
    next_code = eoi + 1
    while True:
        code = read_code(width)
        if code == clear:
            table, width, prev = reset()
            next_code = eoi + 1
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("LZW first code not in table")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("LZW output exceeds frame size")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def lzw_encode(min_code_size: int, data: bytes) -> bytes:
    """Encode index bytes as a GIF LZW stream (greedy longest match,
    dict reset at 4096)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    cur = 0
    curbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal cur, curbits
        cur |= code << curbits
        curbits += width
        while curbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            curbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            # Lockstep with the decoder: the encoder adds its k-th entry
            # after emitting code k, while the decoder adds it only after
            # reading code k+1 — so the encoder widens on the PRE-increment
            # compare (its add #(2^w - 258) fires one code position before
            # the decoder's post-increment rule, landing both sides on the
            # same stream position for the first wider code).
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if curbits:
        out.append(cur & 0xFF)
    return bytes(out)


# --- container ------------------------------------------------------------

def _subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns (data,
    position after the 0 terminator)."""
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(payload):
            raise ValueError("truncated GIF sub-block data")
        chunks.append(payload[pos:pos + n])
        pos += n


def decode_gif_header(payload: bytes) -> dict:
    """Header + frame census: width/height/frame count (real block walk,
    no pixel decode)."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (1 << ((packed & 0x07) + 1))
    n_frames = 0
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            return {"width": w, "height": h, "n_frames": n_frames}
        if block == 0x21:  # extension: label + sub-blocks
            if pos + 2 > len(payload):
                raise ValueError("truncated GIF extension")
            _, pos = _subblocks(payload, pos + 2)
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            ipacked = payload[pos + 9]
            if ipacked & 0x80:  # local color table
                pos += 10 + 3 * (1 << ((ipacked & 0x07) + 1)) + 1
            else:
                pos += 10 + 1  # + LZW min code size byte
            _, pos = _subblocks(payload, pos)
            n_frames += 1
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    raise ValueError("GIF stream ended without trailer")


def decode_gif_frames(payload: bytes) -> list["np.ndarray"]:
    """Full decode of the supported subset → list of (h, w, 3) uint8 RGB
    frames (one per image block, rendered against the global palette)."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    if not packed & 0x80:
        raise ValueError("GIF without a global color table unsupported")
    gct_n = 1 << ((packed & 0x07) + 1)
    if pos + 3 * gct_n > len(payload):
        raise ValueError("truncated global color table")
    palette = np.frombuffer(payload, np.uint8, 3 * gct_n, pos).reshape(gct_n, 3)
    pos += 3 * gct_n
    frames: list[np.ndarray] = []
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:
            return frames
        if block == 0x21:
            if pos + 2 > len(payload):
                raise ValueError("truncated GIF extension")
            _, pos = _subblocks(payload, pos + 2)
        elif block == 0x2C:
            if pos + 11 > len(payload):  # descriptor + LZW min-code byte
                raise ValueError("truncated GIF image descriptor")
            left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos + 1)
            ipacked = payload[pos + 9]
            if (left, top, fw, fh) != (0, 0, w, h):
                raise ValueError("partial-canvas GIF frames unsupported")
            if ipacked & 0x80:
                raise ValueError("local color tables unsupported")
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            min_code = payload[pos + 10]
            data, pos = _subblocks(payload, pos + 11)
            idx = lzw_decode(min_code, data, fw * fh)
            if len(idx) != fw * fh:
                raise ValueError(
                    f"frame decoded {len(idx)} pixels, expected {fw * fh}"
                )
            arr = np.frombuffer(bytes(idx), np.uint8).reshape(fh, fw)
            if int(arr.max(initial=0)) >= gct_n:
                raise ValueError("pixel index outside the color table")
            frames.append(palette[arr])
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    raise ValueError("GIF stream ended without trailer")


def encode_gif(frames: list["np.ndarray"]) -> bytes:
    """Encode (h, w) uint8 GRAYSCALE index frames as an animated GIF89a
    with a 256-entry grayscale global palette (palette[i] = (i, i, i), so
    ``decode_gif_frames(encode_gif(fs))[k][..., 0] == fs[k]`` exactly)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad frame dims {frames[0].shape}")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # 256-entry GCT
    out += bytes(v for i in range(256) for v in (i, i, i))
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share the canvas size")
        out += b"\x21\xf9\x04\x00\x02\x00\x00\x00"  # GCE: 2cs delay
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(8)  # LZW min code size
        lz = lzw_encode(8, fr.astype(np.uint8).tobytes())
        for i in range(0, len(lz), 255):
            chunk = lz[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def synth_gif(width: int, height: int, n_frames: int) -> bytes:
    """Deterministic animated-gradient GIF — the fixture generator for
    the real frame-sampling path (q95, tests). Frame k pixel (y, x) =
    (x + 2*y + 31*k) mod 256 grayscale."""
    ys = np.arange(height, dtype=np.int64)[:, None]
    xs = np.arange(width, dtype=np.int64)[None, :]
    return encode_gif(
        [((xs + 2 * ys + 31 * k) % 256).astype(np.uint8) for k in range(n_frames)]
    )
