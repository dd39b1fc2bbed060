"""Mel frontend parity vs the reference torch.stft pipeline + streaming
equivalence of the incremental MelStream."""

import numpy as np

from conftest import load_fixture
from voxtral_tpu.audio.mel import (
    MelStream, batch_log_mel, batch_log_mel_jax, mel_filters, pad_audio_offline,
)
from voxtral_tpu.config import AudioConfig, StreamingConfig


def test_mel_filters_match_reference():
    g = load_fixture("mel.npz")
    np.testing.assert_allclose(mel_filters(), g["filters"], atol=1e-6)


def test_batch_mel_matches_reference():
    g = load_fixture("mel.npz")
    ours = batch_log_mel(g["audio"])
    ref = g["mel"]  # reference drops the last stft frame internally, as we do
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_batch_mel_padded_matches_reference():
    g = load_fixture("mel.npz")
    ours = batch_log_mel(g["padded"])
    ref = g["mel_padded"]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_offline_padding_schedule():
    g = load_fixture("mel.npz")
    ours = pad_audio_offline(g["audio"])
    np.testing.assert_array_equal(ours, g["padded"])


def test_jax_mel_matches_numpy():
    g = load_fixture("mel.npz")
    np.testing.assert_allclose(
        np.asarray(batch_log_mel_jax(g["padded"])),
        batch_log_mel(g["padded"]), atol=2e-4, rtol=1e-4)


def test_melstream_equals_batch():
    """Incremental mel over ragged chunks == batch mel of the padded signal."""
    rng = np.random.RandomState(3)
    audio = (rng.randn(20000) * 0.2).astype(np.float32)
    scfg = StreamingConfig()
    acfg = AudioConfig()
    mult = acfg.raw_audio_per_token

    padded = pad_audio_offline(audio, acfg, scfg)
    batch = batch_log_mel(padded, acfg)       # [128, F]

    ms = MelStream(left_pad_samples=scfg.n_left_pad_tokens * mult)
    # ragged feeding
    pos, sizes = 0, [1, 7, 160, 999, 4000, 3000]
    i = 0
    while pos < len(audio):
        n = min(sizes[i % len(sizes)], len(audio) - pos)
        ms.feed(audio[pos:pos + n])
        pos += n
        i += 1
    # right padding as vox_stream_flush does: align + 17 tokens of zeros
    align = (mult - (len(audio) % mult)) % mult
    ms.feed(np.zeros(align + scfg.n_right_pad_tokens * mult, np.float32))
    ms.finish()

    ours = ms.frames().T                      # [128, F]
    assert ours.shape == batch.shape
    np.testing.assert_allclose(ours, batch, atol=1e-5, rtol=1e-5)


def test_melstream_discard_keeps_later_frames():
    rng = np.random.RandomState(4)
    audio = (rng.randn(16000) * 0.2).astype(np.float32)
    ms1 = MelStream(left_pad_samples=0)
    ms1.feed(audio)
    full = ms1.frames().copy()
    ms2 = MelStream(left_pad_samples=0)
    ms2.feed(audio[:8000])
    ms2.discard_before(ms2.n_frames - 2)
    ms2.feed(audio[8000:])
    tail = ms2.frames()
    np.testing.assert_allclose(
        tail, full[ms2.frame_offset:ms2.frame_offset + tail.shape[0]],
        atol=1e-6)
