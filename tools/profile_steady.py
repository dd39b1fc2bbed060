#!/usr/bin/env python3
"""Fleet step time at ring-FULL (steady-state) context vs the fresh-stream
context bench.py's short run measures.

Why: prefix-bucketed ring reads (commit 0030410) made attention cost scale
with the ACTUAL context, so a fresh fleet (decoder pos ~240 after bench's 10
chunks) reads ~256 slots/layer while a long-running stream reads the whole
ring (dec 2088, enc 1072 slots) — at B=32 int8 that is ~3.6 GB of extra HBM
traffic per decode iteration, the same order as the Q8 weight reads. This
tool ages the state synthetically (cursor advanced past one wrap, every slot
position valid) — ring CONTENTS don't affect timing, only validity/masks do.

Usage: VOX_PROF_STREAMS=32 python tools/profile_steady.py
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
    age_fleet_state, fleet_step_pcm, init_fleet_state)
from voxtral_tpu.weights import random_params_device

B = int(os.environ.get("VOX_PROF_STREAMS", "32"))
T = int(os.environ.get("VOX_PROF_CHUNK_MEL", "160"))
cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
params = random_params_device(cfg, seed=0)
jax.block_until_ready(params)
from voxtral_tpu.quant import quantize_params
params = quantize_params(params)
jax.block_until_ready(params)
t_ada = ada_scales(params["decoder"],
                   time_conditioning(cfg.streaming.delay_tokens,
                                     cfg.decoder.dim))
rng = np.random.RandomState(0)
pcm = jnp.asarray((rng.rand(B, T * cfg.audio.hop_length) - 0.5)
                  .astype(np.float32))


def aged_state(age_positions: int):
    st = init_fleet_state(cfg, batch=B, enc_ring=912, dec_ring=2048,
                          max_mel_chunk=320, kv_dtype="int8")
    return age_fleet_state(cfg, st, age_positions)


def run(name, state, iters=8):
    state, tok, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
    np.asarray(tok)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, tok, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
        np.asarray(tok)
    ms = (time.perf_counter() - t0) / iters * 1e3
    audio = B * T / 100.0
    print(f"{name:28s} {ms:8.1f} ms/step -> {audio / ms * 1e3:6.1f} audio-s/s",
          file=sys.stderr)
    del state
    return ms


print(f"config: B={B} T={T} Q8 + int8 KV, dec ring 2048, enc ring 912",
      file=sys.stderr)
run("fresh (ctx ~200)", init_fleet_state(
    cfg, batch=B, enc_ring=912, dec_ring=2048, max_mel_chunk=320,
    kv_dtype="int8"))
run("steady (rings full)", aged_state(4096))
