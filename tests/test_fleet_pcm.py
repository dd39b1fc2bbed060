"""Device-side mel (fleet PCM path) parity: chunked _device_log_mel over the
padded stream must equal batch_log_mel of the whole padded signal frame-for-
frame, and fleet_step_pcm must produce the same tokens as the host-mel fleet
path fed batch mel of the same audio."""

import numpy as np
import jax.numpy as jnp

from voxtral_tpu.audio.mel import batch_log_mel, pad_audio_offline
from voxtral_tpu.models.decoder import ada_scales, time_conditioning
from voxtral_tpu.runtime.fleet import (
    _device_log_mel, fleet_bootstrap, fleet_bootstrap_pcm, fleet_step,
    fleet_step_pcm, init_fleet_state, pcm_stream,
)


def test_device_mel_matches_batch(tiny_cfg):
    rng = np.random.RandomState(0)
    audio = (rng.randn(3 * 16000) * 0.3).astype(np.float32)
    padded = pad_audio_offline(audio, tiny_cfg.audio, tiny_cfg.streaming)
    ref = batch_log_mel(padded, tiny_cfg.audio)          # [mel, F]

    hop = tiny_cfg.audio.hop_length
    lap = tiny_cfg.audio.window_size - hop
    stream = pcm_stream(padded, tiny_cfg)
    tail = jnp.zeros((1, lap), jnp.float32)
    chunks = []
    step = 64 * hop                                       # 64 frames/chunk
    usable = (len(stream) // step) * step
    for i in range(0, usable, step):
        mel, tail = _device_log_mel(
            tiny_cfg, tail, jnp.asarray(stream[None, i:i + step]))
        chunks.append(np.asarray(mel[0]))
    got = np.concatenate(chunks, axis=1)
    n = got.shape[1]
    assert n <= ref.shape[1]
    np.testing.assert_allclose(got, ref[:, :n], rtol=2e-4, atol=2e-4)


def test_fleet_pcm_tokens_match_host_mel(tiny_cfg, tiny_params):
    rng = np.random.RandomState(1)
    audio = (rng.randn(4 * 16000) * 0.3).astype(np.float32)
    padded = pad_audio_offline(audio, tiny_cfg.audio, tiny_cfg.streaming)
    t_ada = ada_scales(tiny_params["decoder"],
                       time_conditioning(tiny_cfg.streaming.delay_tokens,
                                         tiny_cfg.decoder.dim))
    hop = tiny_cfg.audio.hop_length
    T0, T = 320, 160                                     # mel frames

    def run(pcm_mode):
        state = init_fleet_state(tiny_cfg, batch=1, enc_ring=256,
                                 dec_ring=128, max_mel_chunk=T0)
        toks = []
        mel_full = batch_log_mel(padded, tiny_cfg.audio)
        n_steps = (min(mel_full.shape[1],
                       (len(padded) // hop)) - T0) // T
        stream = pcm_stream(padded, tiny_cfg)
        if pcm_mode:
            state, t, _ = fleet_bootstrap_pcm(
                tiny_params, tiny_cfg, state,
                jnp.asarray(stream[None, :T0 * hop]), t_ada)
            toks.append(np.asarray(t))
            for c in range(n_steps):
                s0 = (T0 + c * T) * hop
                state, t, _ = fleet_step_pcm(
                    tiny_params, tiny_cfg, state,
                    jnp.asarray(stream[None, s0:s0 + T * hop]), t_ada)
                toks.append(np.asarray(t))
        else:
            state, t, _ = fleet_bootstrap(
                tiny_params, tiny_cfg, state,
                jnp.asarray(mel_full[None, :, :T0]), t_ada)
            toks.append(np.asarray(t))
            for c in range(n_steps):
                f0 = T0 + c * T
                state, t, _ = fleet_step(
                    tiny_params, tiny_cfg, state,
                    jnp.asarray(mel_full[None, :, f0:f0 + T]), t_ada)
                toks.append(np.asarray(t))
        return np.concatenate(toks, axis=1)[0]

    t_pcm = run(True)
    t_mel = run(False)
    assert t_pcm.shape == t_mel.shape
    agree = (t_pcm == t_mel).mean()
    assert agree >= 0.98, (agree, t_pcm, t_mel)


def test_fleet_split_bootstrap_matches_batch_pipeline(tiny_cfg, tiny_params):
    """The bootstrap runs its encoder pass in pending-capacity sub-chunks
    (fleet.py) — with max_mel_chunk=160 the 320-mel bootstrap must split
    into two sub-chunks and still reproduce the batch pipeline's greedy
    tokens exactly."""
    from voxtral_tpu.models.pipeline import transcribe_tokens_batch
    rng = np.random.RandomState(8)
    audio = (rng.randn(3 * 16000) * 0.3).astype(np.float32)
    want = [int(t) for t in
            transcribe_tokens_batch(tiny_params, tiny_cfg, audio)[0]]
    assert len(want) > 10

    padded = pad_audio_offline(audio, tiny_cfg.audio, tiny_cfg.streaming)
    stream = pcm_stream(padded, tiny_cfg)
    t_ada = ada_scales(tiny_params["decoder"],
                       time_conditioning(tiny_cfg.streaming.delay_tokens,
                                         tiny_cfg.decoder.dim))
    hop = tiny_cfg.audio.hop_length
    T0, T = 320, 160
    state = init_fleet_state(tiny_cfg, batch=1, enc_ring=256, dec_ring=128,
                             max_mel_chunk=T)     # pending 80 < bootstrap 160
    assert state.encoder.pending_sp.shape[1] < T0 // 2   # split is exercised
    state, t, _ = fleet_bootstrap_pcm(
        tiny_params, tiny_cfg, state, jnp.asarray(stream[None, :T0 * hop]),
        t_ada)
    out = [int(x) for x in np.asarray(t)[0] if x >= 0]
    pos = T0 * hop
    while pos + T * hop <= len(stream):
        state, t, _ = fleet_step_pcm(
            tiny_params, tiny_cfg, state,
            jnp.asarray(stream[None, pos:pos + T * hop].copy()), t_ada)
        out += [int(x) for x in np.asarray(t)[0] if x >= 0]
        pos += T * hop
    assert out == want[:len(out)]
    assert len(out) >= len(want) - T // 8      # tail loses < one chunk


def test_fleet_int4_encoder_rings_run_and_track_int8(tiny_cfg, tiny_params):
    """enc_kv_dtype="int4" (packed encoder rings, full-precision-path
    decoder): the fleet step must run end-to-end and emit tokens; the
    greedy stream tracks the int8-ring stream (identical up to int4
    quantization flips on near-tie argmaxes — with tiny random weights
    the streams are usually identical; assert high agreement, not
    equality)."""
    import jax.numpy as jnp
    from voxtral_tpu.models.decoder import ada_scales, time_conditioning
    from voxtral_tpu.runtime.fleet import (
        fleet_bootstrap_pcm, fleet_step_pcm, init_fleet_state)

    cfg = tiny_cfg
    t_ada = ada_scales(tiny_params["decoder"],
                       time_conditioning(cfg.streaming.delay_tokens,
                                         cfg.decoder.dim))
    rng = np.random.RandomState(0)
    hop = cfg.audio.hop_length
    pcm0 = jnp.asarray((rng.rand(1, 320 * hop) - 0.5).astype(np.float32))
    pcm = jnp.asarray((rng.rand(1, 40 * hop) - 0.5).astype(np.float32))

    streams = {}
    for enc_kv in ("int8", "int4"):
        state = init_fleet_state(cfg, batch=1, enc_ring=48, dec_ring=None,
                                 max_mel_chunk=320, kv_dtype="float",
                                 enc_kv_dtype=enc_kv)
        toks = []
        state, t, _ = fleet_bootstrap_pcm(tiny_params, cfg, state, pcm0,
                                          t_ada)
        toks += [int(x) for x in np.asarray(t)[0] if x >= 0]
        for _ in range(3):
            state, t, _ = fleet_step_pcm(tiny_params, cfg, state, pcm, t_ada)
            toks += [int(x) for x in np.asarray(t)[0] if x >= 0]
        streams[enc_kv] = toks
        if enc_kv == "int4":
            assert (state.encoder.k_ring[0].shape[-1]
                    == cfg.encoder.attn_dim // 2)
    a, b = streams["int8"], streams["int4"]
    assert len(a) == len(b) > 10
    agree = sum(x == y for x, y in zip(a, b)) / len(a)
    assert agree > 0.9, (agree, a, b)
