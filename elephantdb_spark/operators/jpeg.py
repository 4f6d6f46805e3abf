"""Baseline JPEG codec in pure numpy — no imaging libraries.

Supported subset (declared, everything else raises ``ValueError``):
8-bit baseline sequential DCT (SOF0), Huffman entropy coding, grayscale
or YCbCr color, 4:4:4 sampling (no chroma subsampling), no restart
markers, no progressive/arithmetic/12-bit modes. The encoder emits
exactly this subset with the standard Annex K quantization and Huffman
tables (ITU-T T.81), so ``decode(encode(x))`` reconstructs ``x`` within
the quantization error of the chosen quality.

The reference engine stores opaque bytes only (KeyValDocument.java:6-7);
this codec exists so the multimodal pipeline's image path
(operators/multimodal.py) can decode real compressed payloads without
container-missing imaging libraries.

Numerics: the DCT/IDCT are the orthonormal 8x8 DCT-II matrix pair
(exact transposes, float64), so the only loss in a round-trip is
quantization + uint8 clamping — testable as a PSNR bound.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K) ----------------------------------------

#: zig-zag order: ZIGZAG[i] = block index (row-major) of the i-th scan coeff
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

STD_LUMA_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)  # row-major

STD_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits[1..16], values) — Annex K.3
DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: forward = A @ B @ A.T, inverse = A.T @ C @ A."""
    n = np.arange(8)
    a = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    a[0] /= np.sqrt(2)
    return a

_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], values: list[int]):
    """(decode_map {(length, code): symbol}, encode_map {symbol: (code, length)})."""
    decode, encode = {}, {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            sym = values[k]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


# --- bit IO over the entropy-coded segment ---------------------------------

class _BitReader:
    """MSB-first bit reader with JPEG 0xFF00 byte-unstuffing, buffered so
    each read is O(1) int ops (not per-bit byte indexing). Hitting any
    real marker inside entropy data raises ValueError (restart markers are
    outside the declared subset)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.buf = 0
        self.nbuf = 0

    def _fill(self, need: int) -> None:
        while self.nbuf < need:
            if self.pos >= len(self.d):
                raise ValueError("entropy stream exhausted")
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.d):
                    raise ValueError("entropy stream exhausted at 0xFF")
                nxt = self.d[self.pos]
                self.pos += 1
                if nxt != 0x00:
                    raise ValueError(
                        f"marker 0xFF{nxt:02X} inside entropy data "
                        "(restart intervals are outside the supported subset)"
                    )
            self.buf = (self.buf << 8) | b
            self.nbuf += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nbuf -= n
        v = (self.buf >> self.nbuf) & ((1 << n) - 1)
        self.buf &= (1 << self.nbuf) - 1
        return v

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy data")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.buf >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.buf &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


def _extend(v: int, n: int) -> int:
    """T.81 EXTEND: map an n-bit magnitude to its signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --- decoder ---------------------------------------------------------------

def _segments(payload: bytes):
    """Yield (marker, payload_start, payload_end) for each marker segment
    up to (and including a zero-length) SOS; entropy data handled by caller."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            return
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        if length < 2 or pos + 2 + length > len(payload):
            raise ValueError("truncated JPEG segment")
        yield marker, pos + 4, pos + 2 + length
        pos += 2 + length
        if marker == 0xDA:  # SOS: entropy data follows; caller takes over
            return
    raise ValueError("JPEG stream ended without SOS/EOI")


def _valueerror_only(fn):
    """Normalize the parser's failure zoo: truncated segments index past
    buffers (IndexError) or break struct.unpack_from — the declared
    contract is ValueError ONLY (the mapInPandas fallbacks catch exactly
    that; anything else would fail the whole Spark task)."""
    import functools

    @functools.wraps(fn)
    def wrapped(payload, *a, **kw):
        try:
            return fn(payload, *a, **kw)
        except (IndexError, struct.error) as exc:
            raise ValueError(f"malformed JPEG stream: {exc!r}") from exc

    return wrapped


@_valueerror_only
def decode_jpeg_header(payload: bytes) -> dict:
    """Parse markers up to SOF: width/height/components/mode. Any SOF
    variant is reported; only SOF0 is pixel-decodable here."""
    for marker, s, e in _segments(payload):
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            if e - s < 6:
                raise ValueError("truncated SOF")
            precision = payload[s]
            h, w = struct.unpack_from(">HH", payload, s + 1)
            nc = payload[s + 5]
            return {
                "width": w,
                "height": h,
                "n_components": nc,
                "bit_depth": precision,
                "baseline": marker == 0xC0,
            }
    raise ValueError("JPEG has no SOF marker")


@_valueerror_only
def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Full baseline decode → (h, w, c) uint8 (c = 1 grayscale, 3 RGB).
    Outside-subset streams (progressive, subsampled, restart intervals,
    12-bit) raise ValueError."""
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    sof = None
    comps = []  # (id, qt_id)
    scan = None  # list of (comp_idx, dc_id, ac_id)
    sos_end = None

    for marker, s, e in _segments(payload):
        seg = payload[s:e]
        if marker == 0xDB:  # DQT
            pos = 0
            while pos < len(seg):
                pq, tq = seg[pos] >> 4, seg[pos] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                if pos + 65 > len(seg):
                    raise ValueError("truncated DQT")
                zz = np.frombuffer(seg, np.uint8, 64, pos + 1).astype(np.int64)
                qt = np.empty(64, np.int64)
                qt[ZIGZAG] = zz  # de-zigzag into row-major
                qts[tq] = qt.reshape(8, 8)
                pos += 65
        elif marker == 0xC4:  # DHT
            pos = 0
            while pos < len(seg):
                tc, th = seg[pos] >> 4, seg[pos] & 0x0F
                bits = [0] + list(seg[pos + 1:pos + 17])
                n = sum(bits)
                vals = list(seg[pos + 17:pos + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                dec, _ = _canonical_codes(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = dec
                pos += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                if hv != 0x11:
                    raise ValueError(
                        "chroma subsampling outside the supported 4:4:4 subset"
                    )
                comps.append((cid, tq))
            sof = (w, h, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals outside the supported subset")
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns != len(comps):
                raise ValueError("partial-scan JPEG unsupported")
            scan = []
            cids = [c[0] for c in comps]
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                if cid not in cids:
                    raise ValueError("SOS references unknown component")
                scan.append((cids.index(cid), tt >> 4, tt & 0x0F))
            sos_end = e
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    w, h, nc = sof
    if w == 0 or h == 0:
        raise ValueError("zero-dimension JPEG")
    # entropy data runs from SOS payload end to EOI
    eoi = payload.rfind(b"\xff\xd9")
    if eoi < sos_end:
        raise ValueError("JPEG missing EOI")
    reader = _BitReader(payload[sos_end:eoi])

    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = [np.empty((bh * 8, bw * 8), np.float64) for _ in range(nc)]
    pred = [0] * nc
    for by in range(bh):
        for bx in range(bw):
            for ci, dc_id, ac_id in scan:
                dc_t = dc_tables.get(dc_id)
                ac_t = ac_tables.get(ac_id)
                qt = qts.get(comps[ci][1])
                if dc_t is None or ac_t is None or qt is None:
                    raise ValueError("scan references undefined table")
                zz = np.zeros(64, np.int64)
                n = reader.decode_symbol(dc_t)
                if n > 11:
                    raise ValueError("bad DC category")
                pred[ci] += _extend(reader.bits(n), n)
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = reader.decode_symbol(ac_t)
                    r, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[k] = _extend(reader.bits(size), size)
                    k += 1
                block = np.zeros(64, np.int64)
                block[ZIGZAG] = zz
                coeffs = block.reshape(8, 8) * qt
                spatial = _DCT.T @ coeffs @ _DCT
                planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = spatial
    out = [np.clip(p[:h, :w] + 128.0, 0, 255) for p in planes]
    if nc == 1:
        return np.rint(out[0]).astype(np.uint8)[:, :, None]
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.rint(np.clip(rgb, 0, 255)).astype(np.uint8)


# --- encoder ---------------------------------------------------------------

def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_block(
    bw: _BitWriter, block: np.ndarray, qt: np.ndarray, pred: int,
    dc_enc: dict, ac_enc: dict,
) -> int:
    coeffs = _DCT @ block @ _DCT.T
    q = np.rint(coeffs / qt).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    n = _category(diff)
    code, length = dc_enc[n]
    bw.write(code, length)
    if n:
        bw.write(diff if diff > 0 else diff + (1 << n) - 1, n)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_enc[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, c) uint8 with c in {1, 3} → baseline JFIF bytes (4:4:4,
    standard Annex K Huffman tables, IJG-scaled quantization)."""
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError(f"need (h, w, c) uint8 with c in 1/3, got {arr.shape}")
    h, w, c = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 65535 or w > 65535:
        raise ValueError("image too large for JPEG dims")
    luma_qt = _quality_scale(STD_LUMA_QT, quality).reshape(8, 8)
    chroma_qt = _quality_scale(STD_CHROMA_QT, quality).reshape(8, 8)
    a = arr.astype(np.float64)
    if c == 3:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        plane_qts = [luma_qt, chroma_qt, chroma_qt]
    else:
        planes = [a[..., 0]]
        plane_qts = [luma_qt]

    _, dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    _, ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    _, dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    _, ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    enc_tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (c - 1)

    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((bh * 8, bwid * 8), np.float64)
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1:h, :]  # edge-replicate padding
        pp[:, w:] = pp[:, w - 1:w]
        padded.append(pp - 128.0)

    writer = _BitWriter()
    pred = [0] * c
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(c):
                block = padded[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                pred[ci] = _encode_block(
                    writer, block, plane_qts[ci], pred[ci], *enc_tables[ci]
                )
    entropy = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, qt: np.ndarray) -> bytes:
        zz = np.empty(64, np.uint8)
        zz[:] = qt.reshape(-1)[ZIGZAG]
        return seg(0xDB, bytes([tq]) + zz.tobytes())

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th] + bits[1:] + vals))

    sof_comps = b"".join(
        bytes([i + 1, 0x11, 0 if i == 0 else 1]) for i in range(c)
    )
    sos_comps = b"".join(
        bytes([i + 1, 0x00 if i == 0 else 0x11]) for i in range(c)
    )
    out = [
        b"\xff\xd8",  # SOI
        seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),  # APP0
        dqt(0, luma_qt),
    ]
    if c == 3:
        out.append(dqt(1, chroma_qt))
    out.append(seg(0xC0, struct.pack(">BHHB", 8, h, w, c) + sof_comps))
    out.append(dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out.append(dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if c == 3:
        out.append(dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out.append(dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    out.append(seg(0xDA, bytes([c]) + sos_comps + b"\x00\x3f\x00"))
    out.append(entropy)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)
