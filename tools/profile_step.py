#!/usr/bin/env python3
"""Fleet-step timing on the real chip: chained (device-true) vs per-step-sync,
plus raw host<->device tunnel RTT. HBM is tight (16 GB vs 8.8 GB params +
~4 GB state at B=8), so exactly ONE fleet state lives at a time."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.models.decoder import ada_scales, time_conditioning
from voxtral_tpu.runtime.fleet import fleet_step, init_fleet_state
from voxtral_tpu.weights import random_params_device

B = int(os.environ.get("B", "8"))
T = int(os.environ.get("T", "160"))

cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
print("making params...", file=sys.stderr)
params = random_params_device(cfg, seed=0)
t_ada = ada_scales(params["decoder"],
                   time_conditioning(cfg.streaming.delay_tokens, cfg.decoder.dim))
mel = jnp.zeros((B, cfg.audio.mel_bins, T), jnp.float32)

# tunnel RTT first (cheap)
x = jnp.zeros((1,), jnp.int32)
np.asarray(x)
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(x + 1)
rtt = (time.perf_counter() - t0) / 20 * 1000
print(f"{'tunnel RTT (tiny xfer)':28s} {rtt:8.2f} ms")

state = init_fleet_state(cfg, batch=B, enc_ring=1024, dec_ring=2048,
                         max_mel_chunk=max(T, 320))
step = lambda s: fleet_step(params, cfg, s, mel, t_ada)
state, tok, _ = step(state)
np.asarray(tok)  # compile + land

N = 10
t0 = time.perf_counter()
for _ in range(N):
    state, tok, _ = step(state)
np.asarray(tok)
print(f"{'fleet_step chained x10':28s} {(time.perf_counter()-t0)/N*1000:8.2f} ms/step")

t0 = time.perf_counter()
for _ in range(N):
    state, tok, _ = step(state)
    np.asarray(tok)
print(f"{'fleet_step sync-each':28s} {(time.perf_counter()-t0)/N*1000:8.2f} ms/step")
