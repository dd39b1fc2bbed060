#!/usr/bin/env python3
"""bf16 north-star sweep (BASELINE.md:35 — ">=50x real-time per v5e chip at
bf16"): measure the fleet at bf16 weights across stream counts and KV ring
dtypes.

Two families:
  - strict bf16: bf16 weights + bf16 KV rings (the f32-free analogue of the
    reference's default config — which itself runs an f16 KV cache,
    voxtral.c:189-190, so "bf16" pins the WEIGHT precision);
  - bf16 weights + int8 KV rings (weight precision unchanged; KV
    quantization is a serving-state choice like the reference's fp16 KV).

Memory math (16 GB HBM): bf16 weights ~8.6 GB; per stream at dec ring 2048 /
enc ring 840: ~440 MB bf16 KV, ~220 MB int8 KV.

Usage: python tools/profile_bf16.py [B:kv[:CHUNK_MEL] ...]
       e.g.  12:float 24:int8 24:int8:320
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.models.decoder import ada_scales, time_conditioning
from voxtral_tpu.runtime.fleet import (
    age_fleet_state, fleet_bootstrap_pcm, fleet_step_pcm, init_fleet_state)
from voxtral_tpu.weights import random_params_device

ENC_RING = 840
DEC_RING = 2048
CHUNK_MEL = 160


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_config(params, cfg, t_ada, batch, kv_dtype, chunk_mel=CHUNK_MEL,
               dec_ring=DEC_RING, iters=6, enc_kv_dtype=None):
    # encoder ring must hold window + the chunk's pending block
    enc_ring = max(ENC_RING, cfg.encoder.window + chunk_mel // 2 + 10)
    state = init_fleet_state(cfg, batch=batch, enc_ring=enc_ring,
                             dec_ring=dec_ring, max_mel_chunk=chunk_mel,
                             kv_dtype=kv_dtype, enc_kv_dtype=enc_kv_dtype)
    rng = np.random.RandomState(0)
    hop = cfg.audio.hop_length
    boot_mel = max(320, chunk_mel)
    pcm0 = jnp.asarray((rng.rand(batch, boot_mel * hop) - 0.5)
                       .astype(np.float32))
    pcm = jnp.asarray((rng.rand(batch, chunk_mel * hop) - 0.5)
                      .astype(np.float32))
    t0 = time.perf_counter()
    state, tokens, _ = fleet_bootstrap_pcm(params, cfg, state, pcm0, t_ada)
    np.asarray(tokens)
    log(f"  bootstrap+compile: {time.perf_counter() - t0:.1f}s")
    for _ in range(2):
        state, tokens, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
    np.asarray(tokens)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, tokens, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
        np.asarray(tokens)
    dt = time.perf_counter() - t0
    fresh = batch * (chunk_mel / 100.0) * iters / dt
    fresh_ms = dt / iters * 1e3

    # steady state: rings full, prefix buckets read the whole ring
    phys = state.decode.k_ring[0].shape[1]
    state = age_fleet_state(cfg, state, max(4096, phys + 64))
    state, tokens, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
    np.asarray(tokens)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, tokens, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
        np.asarray(tokens)
    dt = time.perf_counter() - t0
    steady = batch * (chunk_mel / 100.0) * iters / dt
    del state, tokens, pcm, pcm0
    return fresh, fresh_ms, steady


def main():
    configs = []
    for a in sys.argv[1:]:
        parts = a.split(":")
        chunk = int(parts[2]) if len(parts) > 2 else CHUNK_MEL
        ring = int(parts[3]) if len(parts) > 3 else DEC_RING
        enc_kv = parts[4] if len(parts) > 4 else None
        configs.append((int(parts[0]), parts[1], chunk, ring, enc_kv))
    if not configs:
        configs = [(14, "float", CHUNK_MEL, DEC_RING, None),
                   (24, "int8", CHUNK_MEL, DEC_RING, None)]
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    log("initializing 4B random params on device (bf16)...")
    t0 = time.perf_counter()
    params = random_params_device(cfg, seed=0)
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
    log(f"  params ready in {time.perf_counter() - t0:.1f}s")
    t_ada = ada_scales(params["decoder"],
                       time_conditioning(cfg.streaming.delay_tokens,
                                         cfg.decoder.dim))
    for batch, kv, chunk, ring, enc_kv in configs:
        log(f"config: B={batch} bf16 weights, {kv} KV"
            + (f" (enc {enc_kv})" if enc_kv else "")
            + f", chunk {chunk} mel, dec ring {ring}")
        try:
            fresh, fresh_ms, steady = run_config(params, cfg, t_ada, batch,
                                                 kv, chunk, ring,
                                                 enc_kv_dtype=enc_kv)
            log(f"  RESULT B={batch} kv={kv} enc_kv={enc_kv} "
                f"chunk={chunk} ring={ring}: "
                f"fresh {fresh:.1f} audio-s/s ({fresh_ms:.1f} ms/step) | "
                f"steady {steady:.1f} audio-s/s")
        except Exception as e:  # OOM etc: report and continue the sweep
            log(f"  FAILED B={batch} kv={kv} chunk={chunk} ring={ring}: "
                f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
