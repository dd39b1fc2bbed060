#!/usr/bin/env python3
"""BASELINE config #4: the FULL 8192-position rolling window at 4B shapes
(voxtral_decoder.c:354-384; reference README.md:354 "Max audio length:
Unlimited"). Every serving measurement so far used dec_ring=2048 (the
live-mode KV cap, voxtral.c:412); offline VoxStream/batch keep the full
window — this measures what that costs.

Part 1 (fleet): Q8 weights + int8 KV, dec ring 8192+pending, B sweep —
memory fit, fresh + steady (ring-full: contexts past 8192 tokens ≈ 11 min
of audio) audio-s/s.

Part 2 (VoxStream): one >11-minute stream through the B=1 streaming engine
at ring 8192 — the full rolling window wraps in real operation (logical
positions past the ring, fold-time recycling of out-of-window slots).

Round 4: VOX_PROF_WEIGHTS=bf16 runs the fleet sweep at bf16 weights
(+ int8 KV) instead of Q8 — BASELINE config #4 at weight precision
(defaults B 6 8). The VoxStream part runs whatever backend StreamConfig
auto-picks (fused B=1 FleetManager on TPU since round 4).

Usage: python tools/profile_longform.py [B ...]   (default 8 10 12)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import profile_bf16 as pb
from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.models.decoder import ada_scales, time_conditioning
from voxtral_tpu.quant import quantize_params
from voxtral_tpu.weights import random_params_device

DEC_RING = 8192          # init_decode_state adds the pending margin on top
MINUTES = float(os.environ.get("VOX_PROF_MINUTES", "12"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def voxstream_longform(params, cfg):
    """>11 min through VoxStream at the full window: positions pass 8192,
    the ring wraps, tokens keep flowing."""
    from voxtral_tpu.runtime.stream import StreamConfig, VoxStream
    s = VoxStream(params, cfg,
                  stream_cfg=StreamConfig(interval=2.0, continuous=False))
    rng = np.random.RandomState(7)
    secs = int(MINUTES * 60)
    t0 = time.perf_counter()
    for i in range(secs):
        s.feed(((rng.rand(16000) - 0.5) * 0.4).astype(np.float32))
    s.finish()
    dt = time.perf_counter() - t0
    gen = s.n_generated
    dec = (s._mgr.state.decode if getattr(s, "_mgr", None) is not None
           else s.decode_state)
    # ring positions: the decoder consumed ~12.5 tokens/s of audio
    log(f"VoxStream long-form ({s.backend} backend): {secs} s audio in "
        f"{dt:.1f} s ({secs / dt:.1f}x real-time single stream), "
        f"{gen} tokens, final decode pos {int(np.asarray(dec.pos)[0])} "
        f"(ring {dec.k_ring[0].shape[1]} slots, window 8192)")
    assert gen > 8192, "stream did not outgrow the 8192 window"


def main():
    wdt = os.environ.get("VOX_PROF_WEIGHTS", "q8")
    batches = [int(a) for a in sys.argv[1:]] or (
        [6, 8] if wdt == "bf16" else [8, 10, 12])
    log(f"device: {jax.devices()[0]}; weights={wdt}")
    cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    params = random_params_device(cfg, seed=0)
    if wdt != "bf16":
        params = quantize_params(params)
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
    log(f"{wdt} params ready in {time.perf_counter() - t0:.1f}s")
    t_ada = ada_scales(params["decoder"],
                       time_conditioning(cfg.streaming.delay_tokens,
                                         cfg.decoder.dim))
    enc_kv = os.environ.get("VOX_PROF_ENC_KV", "") or None
    for b in batches:
        log(f"config: B={b} {wdt} weights, int8 KV"
            + (f" (enc {enc_kv})" if enc_kv else "")
            + f", dec ring {DEC_RING}")
        try:
            fresh, fresh_ms, steady = pb.run_config(
                params, cfg, t_ada, b, "int8", dec_ring=DEC_RING,
                enc_kv_dtype=enc_kv)
            log(f"  RESULT B={b} ring={DEC_RING}: fresh {fresh:.1f} "
                f"audio-s/s ({fresh_ms:.1f} ms/step) | steady {steady:.1f} "
                f"audio-s/s (context > {DEC_RING * 0.08 / 60:.0f} min)")
        except Exception as e:
            log(f"  FAILED B={b}: {type(e).__name__}: {str(e)[:200]}")

    if MINUTES >= 1:
        log(f"VoxStream {MINUTES:.0f}-minute single stream at the full "
            "window:")
        voxstream_longform(params, cfg)
    else:
        log("VoxStream long-form part skipped (VOX_PROF_MINUTES < 1)")


if __name__ == "__main__":
    main()
