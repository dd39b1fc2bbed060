"""Int8 KV-ring mode: decode/encoder outputs must track the float-ring
reference closely (the rings are quantized per slot per head; the fused
kernel applies scales to score/probability columns — quant.py:quantize_kv).

Runs the Pallas kernel in interpreter mode on CPU (int8 rings are
kernel-only); tiny shapes keep it fast."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxtral_tpu.config import tiny_config
from voxtral_tpu.models.decoder import (
    ada_scales, decode_scan, decoder_prefill, init_decode_state,
    time_conditioning,
)
from voxtral_tpu.models.encoder import encoder_incremental, init_encoder_state


@pytest.fixture(scope="module")
def t_ada(tiny_cfg, tiny_params):
    return ada_scales(tiny_params["decoder"],
                      time_conditioning(6, tiny_cfg.decoder.dim))


def _decode_run(params, cfg, t_ada, kv_dtype, frames, prefix):
    b = frames.shape[0]
    state = init_decode_state(cfg, batch=b, ring_size=64, pending_size=8,
                              kv_dtype=kv_dtype)
    state = decoder_prefill(params["decoder"], cfg, state, prefix, t_ada)
    toks = []
    for c0 in range(0, frames.shape[1], 8):
        chunk = frames[:, c0:c0 + 8]
        nv = jnp.full((b,), chunk.shape[1], jnp.int32)
        state, t, _ = decode_scan(params["decoder"], cfg, state, chunk, nv,
                                  t_ada, stop_at_eos=False)
        toks.append(np.asarray(t))
    return np.concatenate(toks, axis=1)


def test_decode_int8_rings_track_float(tiny_cfg, tiny_params, t_ada):
    rng = np.random.RandomState(0)
    b, n = 2, 24
    d = tiny_cfg.decoder
    frames = jnp.asarray(rng.randn(b, n, d.dim).astype(np.float32) * 0.1)
    prefix = jnp.asarray(rng.randn(b, 4, d.dim).astype(np.float32) * 0.1)
    t_f = _decode_run(tiny_params, tiny_cfg, t_ada, "float", frames, prefix)
    t_q = _decode_run(tiny_params, tiny_cfg, t_ada, "int8", frames, prefix)
    agree = (t_f == t_q).mean()
    assert agree >= 0.85, (agree, t_f, t_q)


def test_encoder_int8_rings_track_float(tiny_cfg, tiny_params):
    rng = np.random.RandomState(1)
    e = tiny_cfg.encoder
    b, s = 2, 8
    chunks = [jnp.asarray(rng.randn(b, s, e.dim).astype(np.float32) * 0.3)
              for _ in range(4)]
    outs = {}
    for mode in ("float", "int8"):
        st = init_encoder_state(tiny_cfg, ring_size=48, batch=b,
                                pending_size=8, kv_dtype=mode)
        acc = []
        for c in chunks:
            st, out = encoder_incremental(tiny_params["encoder"], tiny_cfg,
                                          st, c)
            acc.append(np.asarray(out, np.float32))
        outs[mode] = np.concatenate(acc, axis=1)
    err = np.abs(outs["int8"] - outs["float"])
    rel = err.max() / (np.abs(outs["float"]).max() + 1e-9)
    assert rel < 0.05, rel


def test_decoder_rejects_int4_kv(tiny_cfg):
    """int4 rings are ENCODER-only (per-token decoder unpack measured
    slower — SPEED.md); a silent float fallback would double the intended
    ring HBM and desync fleet_state_pspecs' tree structure (ADVICE r4)."""
    with pytest.raises(AssertionError, match="encoder-only"):
        init_decode_state(tiny_cfg, batch=1, kv_dtype="int4")
