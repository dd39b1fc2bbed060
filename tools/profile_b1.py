#!/usr/bin/env python3
"""Decompose the B=1 single-stream fleet step (VERDICT r4 next #6).

bench.py's single-stream row (Q8 + int8 KV, chunk 160 mel = 20 tokens)
measured 7.06 ms/token = ~141 ms/step, ~22% below the ~14.5 audio-s/s
physical cap SPEED.md derives from the unamortized weight stream alone.
This tool splits that step into:

  - device compute (async-chained steps, ONE sync at the end: the link's
    fixed per-sync cost amortizes away),
  - the bench protocol's per-step host sync (np.asarray download each
    iteration — the serving reality: tokens must land on the host),
  - the per-phase breakdown at B=1 (mel/conv/encoder/adapter/decode),
  - a chunk-length sweep (tokens per dispatch amortize the fixed link
    cost; memory is no constraint at B=1).

Usage: python tools/profile_b1.py
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
from voxtral_tpu.quant import quantize_params
from voxtral_tpu.runtime.fleet import fleet_step_pcm, init_fleet_state
from voxtral_tpu.weights import random_params_device

KV = os.environ.get("VOX_PROF_KV", "int8")
cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
params = random_params_device(cfg, seed=0)
jax.block_until_ready(params)
params = quantize_params(params)
jax.block_until_ready(params)
t_ada = ada_scales(params["decoder"],
                   time_conditioning(cfg.streaming.delay_tokens,
                                     cfg.decoder.dim))
rng = np.random.RandomState(0)
hop = cfg.audio.hop_length


def run(chunk_mel, iters=10, sync_each=True):
    state = init_fleet_state(cfg, batch=1, enc_ring=750 + chunk_mel // 2 + 10,
                             dec_ring=2048, max_mel_chunk=chunk_mel,
                             kv_dtype=KV)
    pcm = jnp.asarray((rng.rand(1, chunk_mel * hop) - 0.5).astype(np.float32))
    for _ in range(3):
        state, tokens, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
    np.asarray(tokens)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, tokens, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
        if sync_each:
            np.asarray(tokens)
    np.asarray(tokens)
    dt = time.perf_counter() - t0
    ms = dt / iters * 1e3
    n_tok = chunk_mel // 8
    print(f"  chunk {chunk_mel:4d} mel ({n_tok:3d} tok) "
          f"{'sync/step' if sync_each else 'async-chain'}: "
          f"{ms:7.1f} ms/step = {ms / n_tok:5.2f} ms/token "
          f"({n_tok * 0.08 * 1e3 / ms:5.2f} audio-s/s)", file=sys.stderr)
    return ms


print("bench protocol (per-step host sync) vs device-only (async chain):",
      file=sys.stderr)
sync160 = run(160, sync_each=True)
async160 = run(160, sync_each=False)
print(f"  -> per-step sync overhead {sync160 - async160:.1f} ms "
      f"(link download + host turnaround)", file=sys.stderr)

print("chunk-length sweep (per-step sync, bench protocol):", file=sys.stderr)
for c in (320, 640):
    run(c, iters=6, sync_each=True)
print("chunk-length sweep (async chain, device compute):", file=sys.stderr)
for c in (320, 640):
    run(c, iters=6, sync_each=False)
