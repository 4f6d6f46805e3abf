"""MJPEG-in-AVI: RIFF container round-trip, real per-frame JPEG decode,
malformed-input contract, and the multimodal dispatch surfaces
(VERDICT r4 item 4 — the frame-sampling stub now covers only inter-frame
codecs)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from elephantdb_spark.operators.avi import (
    decode_avi_mjpeg_frames,
    encode_avi_mjpeg,
    is_avi,
    parse_avi,
    synth_avi,
)


def test_roundtrip_container_metadata():
    p = synth_avi(24, 16, 5, fps=25)
    info = parse_avi(p)
    assert info["width"] == 24
    assert info["height"] == 16
    assert info["n_frames"] == 5
    assert info["handler"] == "MJPG"
    assert info["us_per_frame"] == 40000
    assert len(info["frame_chunks"]) == 5


def test_frames_decode_to_pixels():
    p = synth_avi(24, 16, 4)
    frames = decode_avi_mjpeg_frames(p)
    assert len(frames) == 4
    assert all(f.shape == (16, 24, 3) and f.dtype == np.uint8 for f in frames)
    # frames are distinguishable (the synth shifts the gradient per frame)
    assert any((frames[i] != frames[i + 1]).any() for i in range(3))


def test_every_n_sampling():
    p = synth_avi(8, 8, 7)
    assert len(decode_avi_mjpeg_frames(p, every_n=2)) == 4
    assert len(decode_avi_mjpeg_frames(p, every_n=3)) == 3


def test_odd_sized_jpeg_chunks_stay_word_aligned():
    # odd JPEG byte lengths exercise the RIFF pad rule; all frames must
    # still parse out
    ys, xs = np.mgrid[0:9, 0:11]
    frames = [
        np.stack([xs * 9 + i, ys * 7, xs + ys], -1).astype(np.uint8) % 255
        for i in range(3)
    ]
    p = encode_avi_mjpeg(frames)
    assert len(decode_avi_mjpeg_frames(p)) == 3


def test_malformed_inputs_raise_valueerror():
    good = synth_avi(8, 8, 2)
    for bad in (
        b"",
        b"RIFX" + good[4:],
        good[:20],
        good[:40],
        b"RIFF" + b"\xff\xff\xff\xff" + b"AVI " + good[12:],
    ):
        with pytest.raises(ValueError):
            parse_avi(bad)


def test_truncated_chunk_overrun_raises():
    good = synth_avi(8, 8, 2)
    # corrupt the first LIST size to overrun the container
    pos = good.index(b"LIST")
    bad = good[: pos + 4] + struct.pack("<I", 2**31) + good[pos + 8:]
    with pytest.raises(ValueError):
        parse_avi(bad)


def test_non_mjpeg_codec_raises_honest_stub():
    """A WELL-FORMED AVI with an unsupported codec is the honest-stub
    case (NotImplementedError, like H.264-in-MP4), NOT the malformed-
    bytes case (ValueError) — callers route the former to an ffmpeg
    fallback and treat the latter as corrupt."""
    p = bytearray(synth_avi(8, 8, 2))
    # overwrite each frame chunk's JPEG SOI with a fake codec payload
    i = p.find(b"00dc")
    while i != -1:
        p[i + 8] = 0x00
        i = p.find(b"00dc", i + 4)
    with pytest.raises(NotImplementedError, match="not MJPEG"):
        decode_avi_mjpeg_frames(bytes(p))


def test_interleaved_rec_groups_parse():
    """Standard interleaved muxing wraps each frame in a 'LIST rec '
    group inside movi — frames must still be collected (review finding:
    a flat walk silently dropped ALL frames of interleaved AVIs)."""
    import numpy as np

    from elephantdb_spark.operators.avi import _chunk, _list

    plain = synth_avi(10, 8, 3)
    info = parse_avi(plain)
    # rebuild the container with each frame wrapped in LIST rec
    movi_body = b"".join(
        _list(b"rec ", _chunk(b"00dc", c)) for c in info["frame_chunks"]
    )
    pos = plain.index(b"LIST", plain.index(b"movi") - 8)
    head = plain[:pos]
    new_movi = _list(b"movi", movi_body)
    rebuilt = head + new_movi
    rebuilt = (
        rebuilt[:4]
        + struct.pack("<I", len(rebuilt) - 8)
        + rebuilt[8:]
    )
    out = parse_avi(rebuilt)
    assert len(out["frame_chunks"]) == 3
    frames = decode_avi_mjpeg_frames(rebuilt, every_n=2)
    assert len(frames) == 2
    assert frames[0].shape == (8, 10, 3)
    assert isinstance(frames[0], np.ndarray)


def test_encode_rejects_empty():
    with pytest.raises(ValueError):
        encode_avi_mjpeg([])


def test_sample_frames_dispatches_avi():
    from elephantdb_spark.operators.multimodal import sample_frames

    p = synth_avi(12, 8, 6)
    frames = sample_frames(p, every_n=2)
    assert len(frames) == 3
    assert frames[0].shape == (8, 12, 3)
    # unknown payloads still hit the (narrowed) inter-frame-codec stub
    with pytest.raises(NotImplementedError, match="inter-frame"):
        sample_frames(b"\x00\x01\x02\x03" * 32)


def test_sample_frames_df_real_avi_branch(spark):
    import pandas as pd

    from elephantdb_spark.operators.multimodal import (
        MULTIMODAL_SCHEMA,
        extract_media_features,
        sample_frames_df,
    )

    payloads = [synth_avi(10, 8, 5), synth_avi(8, 6, 3)]
    pdf = pd.DataFrame(
        {
            "id": [1, 2],
            "payload": payloads,
            "meta": [
                {"media_type": "video/x-msvideo", "lang": None, "source": "t"}
            ] * 2,
        }
    )
    mm = spark.createDataFrame(pdf, MULTIMODAL_SCHEMA)
    rows = sample_frames_df(mm, every_n=2, use_real_decoder=True).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r["frame_idx"])
    assert by_id == {1: [0, 2, 4], 2: [0, 2]}
    # frame sigs hash real decoded pixels — same synth params, same sig
    feats = {r["id"]: r for r in extract_media_features(mm).collect()}
    assert feats[1]["width"] == 10 and feats[1]["height"] == 8
    assert feats[2]["duration_ms"] == 3 * 40
