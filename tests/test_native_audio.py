"""Native C++ mel frontend parity vs the numpy MelStream (and therefore vs
the batch pipeline — MelStream itself is parity-tested in test_mel.py)."""

import numpy as np
import pytest

from voxtral_tpu.audio.mel import MelStream
from voxtral_tpu.audio.native import (
    NativeMelStream, native_available, resample_linear_native,
)
from voxtral_tpu.audio.wav import resample_linear
from voxtral_tpu.config import AudioConfig

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native voxaudio build unavailable")


def _run(stream_cls, feeds, left_pad, discards=()):
    s = stream_cls(left_pad_samples=left_pad)
    outs = []
    for i, chunk in enumerate(feeds):
        s.feed(chunk)
        if i in discards:
            s.discard_before(s.frame_offset + s.n_frames // 2)
        outs.append((s.frame_offset, s.frames().copy()))
    s.finish()
    outs.append((s.frame_offset, s.frames().copy()))
    return outs


def test_native_matches_numpy_stream():
    rng = np.random.RandomState(7)
    feeds = [rng.randn(n).astype(np.float32) * 0.3
             for n in (1600, 480, 12345, 160, 7, 6400)]
    ref = _run(MelStream, feeds, left_pad=32 * 1280, discards=(2,))
    nat = _run(NativeMelStream, feeds, left_pad=32 * 1280, discards=(2,))
    assert len(ref) == len(nat)
    for (ro, rf), (no, nf) in zip(ref, nat):
        assert ro == no
        assert rf.shape == nf.shape
        np.testing.assert_allclose(nf, rf, rtol=2e-4, atol=2e-4)


def test_native_tiny_feeds_and_finish():
    rng = np.random.RandomState(8)
    feeds = [rng.randn(n).astype(np.float32) for n in ([3] * 50 + [400, 100])]
    ref = _run(MelStream, feeds, left_pad=0)
    nat = _run(NativeMelStream, feeds, left_pad=0)
    for (ro, rf), (no, nf) in zip(ref, nat):
        assert ro == no and rf.shape == nf.shape
        np.testing.assert_allclose(nf, rf, rtol=2e-4, atol=2e-4)


def test_native_resampler_matches_python():
    rng = np.random.RandomState(9)
    s = rng.randn(44100).astype(np.float32)
    for rate in (44100, 48000, 8000, 16000):
        a = resample_linear(s, rate, 16000)
        b = resample_linear_native(s, rate, 16000)
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_native_feed_return_matches_python():
    """feed() returns the number of NEW frames on both backends (the
    module's API-identical contract — the C++ side used to return the
    total buffered count)."""
    import numpy as np

    from voxtral_tpu.audio.mel import MelStream
    from voxtral_tpu.audio.native import NativeMelStream, native_available
    if not native_available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(0)
    a = MelStream(left_pad_samples=1280)
    b = NativeMelStream(left_pad_samples=1280)
    for n in (100, 3000, 7, 4096, 1600):
        chunk = rng.randn(n).astype(np.float32) * 0.1
        assert a.feed(chunk) == b.feed(chunk)
    assert a.finish() == b.finish()
