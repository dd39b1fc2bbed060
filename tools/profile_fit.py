#!/usr/bin/env python3
"""Fit probe for the bf16 >=125 audio-s/s campaign: would int4-packed
ENCODER rings buy enough HBM for B=28-30?

The round-3 ceiling proof pinned B=26 as the 16 GB fit limit at bf16
weights + int8 KV. The biggest per-stream item is the ENCODER ring
(~121 MB/stream int8 at ring 928) — and unlike the decoder (int4
rejected: the VPU unpack is paid per token, SPEED.md), encoder attention
runs once per chunk, so an int4 ring's unpack cost is paid 1x per 20
tokens.

Before building the int4 kernel path, this probe fakes the int4
FOOTPRINT: encoder window shrunk to 330 so the int8 ring drops to ~the
int4-at-window-750 byte count (ring 432+80 slots ~ 1.0 MB/stream/layer
vs int4's 0.95). Window 330 also cuts encoder-attention DMA roughly in
half, so measure B=26 at BOTH windows to get the correction term:

  predicted int4 step(B) ~ step_B_win330 + [step_26_win750 - step_26_win330]
                           + int4 unpack (~+2 ms, scaled from the decode
                             int4 probe's +1.7 ms per G-element)

Sweep: B=26 win750 (anchor), B=26/28/29/30 win330. Go signal for the
int4 build: B>=28 compiles AND predicted audio-s/s >= 125.

Usage: python tools/profile_fit.py [B:window ...]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.models import decoder
from voxtral_tpu.models.decoder import ada_scales, time_conditioning
from voxtral_tpu.runtime.fleet import (
    age_fleet_state, fleet_bootstrap_pcm, fleet_step_pcm, init_fleet_state)
from voxtral_tpu.weights import random_params_device

CHUNK_MEL = 160


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_config(params, cfg, t_ada, batch, enc_window, iters=6):
    c = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, window=enc_window))
    enc_ring = enc_window + CHUNK_MEL // 2 + 10
    state = init_fleet_state(c, batch=batch, enc_ring=enc_ring,
                             dec_ring=2048, max_mel_chunk=CHUNK_MEL,
                             kv_dtype="int8")
    rng = np.random.RandomState(0)
    hop = c.audio.hop_length
    pcm0 = jnp.asarray((rng.rand(batch, 320 * hop) - 0.5).astype(np.float32))
    pcm = jnp.asarray((rng.rand(batch, CHUNK_MEL * hop) - 0.5)
                      .astype(np.float32))
    t0 = time.perf_counter()
    state, tokens, _ = fleet_bootstrap_pcm(params, c, state, pcm0, t_ada)
    np.asarray(tokens)
    log(f"  bootstrap+compile: {time.perf_counter() - t0:.1f}s")
    for _ in range(2):
        state, tokens, _ = fleet_step_pcm(params, c, state, pcm, t_ada)
    np.asarray(tokens)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, tokens, _ = fleet_step_pcm(params, c, state, pcm, t_ada)
        np.asarray(tokens)
    dt = time.perf_counter() - t0
    fresh = batch * (CHUNK_MEL / 100.0) * iters / dt
    fresh_ms = dt / iters * 1e3

    phys = state.decode.k_ring[0].shape[1]
    state = age_fleet_state(c, state, max(4096, phys + 64))
    state, tokens, _ = fleet_step_pcm(params, c, state, pcm, t_ada)
    np.asarray(tokens)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, tokens, _ = fleet_step_pcm(params, c, state, pcm, t_ada)
        np.asarray(tokens)
    dt = time.perf_counter() - t0
    steady = batch * (CHUNK_MEL / 100.0) * iters / dt
    del state, tokens, pcm, pcm0
    return fresh, fresh_ms, steady


def main():
    configs = []
    for a in sys.argv[1:]:
        b, w = a.split(":")
        configs.append((int(b), int(w)))
    if not configs:
        configs = [(26, 750), (26, 330), (28, 330), (29, 330), (30, 330)]
    log(f"device: {jax.devices()[0]}; unroll={decoder._SCAN_UNROLL}")
    cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    params = random_params_device(cfg, seed=0)
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
    log(f"params ready in {time.perf_counter() - t0:.1f}s")
    t_ada = ada_scales(params["decoder"],
                       time_conditioning(cfg.streaming.delay_tokens,
                                         cfg.decoder.dim))
    for batch, win in configs:
        log(f"config: B={batch} enc_window={win} (bf16 weights, int8 KV)")
        try:
            fresh, fresh_ms, steady = run_config(params, cfg, t_ada, batch,
                                                 win)
            log(f"  RESULT B={batch} win={win}: fresh {fresh:.1f} audio-s/s "
                f"({fresh_ms:.1f} ms/step) | steady {steady:.1f}")
        except Exception as e:
            log(f"  FAILED B={batch} win={win}: "
                f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
