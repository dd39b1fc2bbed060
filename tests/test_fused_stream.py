"""Fused VoxStream backend (StreamConfig(backend="fused")): the B=1
FleetManager delegate must produce EXACTLY the bucketed path's (== the
batch pipeline's) tokens — one compiled program + one download per chunk
instead of the 4-5-program slice pipeline (VERDICT r3 next #2;
reference surface voxtral.h:274-324)."""

import numpy as np
import pytest

from voxtral_tpu.models.pipeline import transcribe_tokens_batch
from voxtral_tpu.runtime import StreamConfig, VoxStream


@pytest.fixture(scope="module")
def audio():
    rng = np.random.RandomState(21)
    return (rng.randn(3 * 16000) * 0.3).astype(np.float32)


@pytest.fixture(scope="module")
def batch_tokens(tiny_cfg, tiny_params, audio):
    toks, _ = transcribe_tokens_batch(tiny_params, tiny_cfg, audio)
    toks = [int(t) for t in toks]
    assert len(toks) > 10
    return toks


def _run(params, cfg, audio, backend, chunk_sizes=(1600,), **sc_kw):
    s = VoxStream(params, cfg, stream_cfg=StreamConfig(
        interval=sc_kw.pop("interval", 0.5), backend=backend, **sc_kw))
    pos, i = 0, 0
    while pos < len(audio):
        n = min(chunk_sizes[i % len(chunk_sizes)], len(audio) - pos)
        s.feed(audio[pos:pos + n])
        pos += n
        i += 1
    s.finish()
    return s


def test_fused_equals_batch(tiny_cfg, tiny_params, audio, batch_tokens):
    s = _run(tiny_params, tiny_cfg, audio, "fused")
    assert s.generated_ids == batch_tokens


def test_fused_equals_batch_ragged_feeds(tiny_cfg, tiny_params, audio,
                                         batch_tokens):
    s = _run(tiny_params, tiny_cfg, audio, "fused",
             chunk_sizes=(160, 1280, 7, 4096, 999, 16000), interval=2.0)
    assert s.generated_ids == batch_tokens


def test_fused_flush_midstream_matches_bucketed(tiny_cfg, tiny_params,
                                                audio):
    """flush() pads become part of the stream; feeding continues after —
    both backends must emit the same final greedy stream."""
    def run(backend):
        s = VoxStream(tiny_params, tiny_cfg, stream_cfg=StreamConfig(
            interval=0.5, backend=backend))
        s.feed(audio[:16000])
        s.flush()
        n_at_flush = s.n_generated
        s.feed(audio[16000:])
        s.finish()
        return s, n_at_flush

    a, na = run("bucketed")
    b, nb = run("fused")
    assert a.generated_ids == b.generated_ids
    # flush drains the delayed tokens on both paths; the device-mel fused
    # path is up to one token fresher at the flush point (the host
    # MelStream holds back the final partial STFT window until more audio
    # arrives; device mel's pcm_tail carries that overlap instead)
    assert na > 0 and nb > 0 and abs(na - nb) <= 1


def test_fused_set_interval_midstream(tiny_cfg, tiny_params, audio,
                                      batch_tokens):
    s = VoxStream(tiny_params, tiny_cfg, stream_cfg=StreamConfig(
        interval=0.5, backend="fused"))
    s.feed(audio[:24000])
    s.set_interval(2.0)
    s.feed(audio[24000:])
    s.finish()
    assert s.generated_ids == batch_tokens


def test_fused_alt_queue_matches_bucketed(tiny_cfg, tiny_params, audio):
    def run(backend):
        s = _run(tiny_params, tiny_cfg, audio, backend, n_alt=3,
                 alt_cutoff=0.95)
        return s

    a, b = run("bucketed"), run("fused")
    assert a.generated_ids == b.generated_ids
    assert [q[0] for q in a.queue] == [q[0] for q in b.queue]
    assert [[j for j, _ in q[2]] for q in a.queue] \
        == [[j for j, _ in q[2]] for q in b.queue]


def test_fused_continuous_watchdog_restart(tiny_cfg, tiny_params, audio,
                                           monkeypatch):
    """The manager's per-slot watchdogs carry the reference self-healing
    into the fused stream: a tiny KV cap forces restarts (⟳♻ in the
    monitor log) and the stream keeps decoding."""
    import voxtral_tpu.runtime.manager as M
    monkeypatch.setattr(M, "MAX_DECODE_KV", 45)
    s = _run(tiny_params, tiny_cfg, audio, "fused", continuous=True)
    assert any(sym.startswith("⟳") for sym in s.monitor_log), s.monitor_log
    assert s.stats()["restarts"] > 0
    assert s.n_generated > 16            # kept decoding after restarts


def test_fused_set_delay_matches_fresh(tiny_cfg, tiny_params, audio):
    a = VoxStream(tiny_params, tiny_cfg, stream_cfg=StreamConfig(
        interval=1.0, delay_tokens=12, backend="fused"))
    b = VoxStream(tiny_params, tiny_cfg, stream_cfg=StreamConfig(
        interval=1.0, backend="fused"))
    b.set_delay(12 * 80)
    for s in (a, b):
        s.feed(audio)
        s.finish()
    assert a.generated_ids == b.generated_ids


def test_fused_stats_shape(tiny_cfg, tiny_params, audio):
    s = _run(tiny_params, tiny_cfg, audio, "fused")
    st = s.stats()
    for key in ("generated", "text_tokens", "decoder_ms", "ms_per_step",
                "audio_s"):
        assert key in st
    assert st["generated"] == s.n_generated > 0
    assert st["decoder_ms"] > 0
    # honest fused stats (VERDICT r4 next #5): non-separable phases are
    # None (not a fake 0.0), the whole-step meaning of decoder_ms is
    # flagged, and mel_frames is the REAL device-consumed frame count
    # (samples through the device / hop), not an n_generated*8 guess
    assert st["encoder_ms"] is None and st["prefill_ms"] is None
    assert st["step_ms_includes_encoder"] is True
    slot = s._mgr.slots[0]
    assert st["mel_frames"] == slot.samples_done \
        // tiny_cfg.audio.hop_length > 0


def test_fused_enc_kv_int4_headline_config(tiny_cfg, tiny_params, audio,
                                           batch_tokens):
    """The benchmark headline serving state (int8 decoder KV + int4-PACKED
    encoder rings) reached through the PUBLIC StreamConfig surface
    (VERDICT r4 next #2): the encoder rings must actually be packed
    nibbles, and the greedy stream must equal the batch pipeline's
    token-for-token (pinned exact: the run is deterministic)."""
    s = _run(tiny_params, tiny_cfg, audio, "fused", kv_dtype="int8",
             enc_kv_dtype="int4")
    enc = s._mgr.state.encoder
    assert enc.k_ring[0].shape[-1] == tiny_cfg.encoder.attn_dim // 2
    assert enc.k_ring[0].dtype.name == "int8"          # packed bytes
    dec = s._mgr.state.decode
    assert dec.k_ring[0].dtype.name == "int8" and dec.k_scale is not None
    assert s.generated_ids == batch_tokens


def test_bucketed_backend_warns_on_kv_dtype(tiny_cfg, tiny_params):
    """--kv/--enc-kv are fused-backend options; the bucketed path runs
    float rings and must say so instead of silently ignoring the request
    (ADVICE r4)."""
    with pytest.warns(UserWarning, match="fused-backend"):
        VoxStream(tiny_params, tiny_cfg, stream_cfg=StreamConfig(
            backend="bucketed", kv_dtype="int8"))
    with pytest.warns(UserWarning, match="fused-backend"):
        VoxStream(tiny_params, tiny_cfg, stream_cfg=StreamConfig(
            backend="bucketed", enc_kv_dtype="int4"))
