"""Registry-resolved video-decoder backends (VERDICT r5 item 7): the
inter-frame-codec stub routes to an optional ffmpeg backend when one is
available; absent backends skip cleanly and keep the honest
NotImplementedError."""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from elephantdb_spark.operators.multimodal import sample_frames, synth_mp4
from elephantdb_spark.registry import (
    register_video_decoder,
    resolve_video_decoder,
    unregister_video_decoder,
)

HAVE_FFMPEG = bool(shutil.which("ffmpeg") and shutil.which("ffprobe"))


def test_unknown_backend_name_raises():
    with pytest.raises(ValueError, match="unknown video decoder"):
        resolve_video_decoder("no-such-backend")


@pytest.mark.skipif(HAVE_FFMPEG, reason="ffmpeg present: stub not reachable")
def test_stub_fires_only_without_any_backend():
    """In an ffmpeg-less environment resolution returns None and the
    inter-frame stub remains — the documented extension point."""
    assert resolve_video_decoder() is None
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_frames(synth_mp4(1000, 32, 24), every_n=1)


def test_registered_backend_routes_interframe_payloads():
    """A registered backend takes over inter-frame payloads while the
    native GIF/AVI paths stay untouched."""
    calls = []

    def fake_factory():
        def decode(payload, every_n):
            calls.append((len(payload), every_n))
            return [np.zeros((2, 2, 3), np.uint8)]

        return decode

    register_video_decoder("fake", fake_factory)
    try:
        frames = sample_frames(synth_mp4(1000, 32, 24), every_n=3)
        assert len(frames) == 1 and frames[0].shape == (2, 2, 3)
        assert calls and calls[0][1] == 3
        # native MJPEG-AVI path must NOT route through the backend
        from elephantdb_spark.operators.avi import synth_avi

        n_before = len(calls)
        avi_frames = sample_frames(synth_avi(8, 8, 2), every_n=1)
        assert len(avi_frames) == 2 and len(calls) == n_before
    finally:
        unregister_video_decoder("fake")


def test_unavailable_backend_factory_skipped_cleanly():
    """A factory whose dependency raises at resolve time is skipped —
    exactly how the ffmpeg backend behaves on a PATH without ffmpeg."""

    def broken_factory():
        raise RuntimeError("dependency not installed")

    register_video_decoder("broken", broken_factory)
    try:
        # explicit name: unavailable → None (not an exception)
        assert resolve_video_decoder("broken") is None
    finally:
        unregister_video_decoder("broken")


@pytest.mark.skipif(not HAVE_FFMPEG, reason="ffmpeg not on PATH")
def test_ffmpeg_backend_decodes_real_video():
    """Opt-in end-to-end check where ffmpeg exists: encode an MJPEG AVI
    (a format ffmpeg reads) and decode it through the backend directly —
    frame count and dimensions must match the container."""
    from elephantdb_spark.operators.avi import synth_avi
    from elephantdb_spark.operators.video_ffmpeg import ffmpeg_cli_decoder

    decode = ffmpeg_cli_decoder()
    frames = decode(synth_avi(32, 16, 4), every_n=2)
    assert len(frames) == 2
    assert all(f.shape == (16, 32, 3) for f in frames)
