#!/usr/bin/env python3
"""End-to-end FleetManager throughput on the real chip (the full serving
path: host buffering -> PCM upload -> fleet_step_masked -> token drain).

bench.py measures the device step with a RESIDENT pcm array; the manager
additionally pays the host->device PCM upload every step (~20 MB at B=32
f32 — ~340 ms on this tunnel, as long as the step itself). Staging depth
controls pipelining: feeding one chunk per poll serializes upload and step
(the old behavior); feeding several chunks ahead lets poll() overlap the
next upload with the running step. wire=s16 halves the upload bytes.

VOX_PROF_STREAMS=32 VOX_PROF_WIRE=s16 VOX_PROF_DEPTH=4 python tools/profile_manager.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.quant import quantize_params
from voxtral_tpu.runtime.manager import FleetManager
from voxtral_tpu.weights import random_params_device

B = int(os.environ.get("VOX_PROF_STREAMS", "32"))
WIRE = os.environ.get("VOX_PROF_WIRE", "f32")
DEPTH = int(os.environ.get("VOX_PROF_DEPTH", "4"))   # chunks buffered ahead
STEPS = int(os.environ.get("VOX_PROF_STEPS", "10"))

cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
params = quantize_params(random_params_device(cfg, seed=0))
mgr = FleetManager(params, cfg, batch=B, chunk_tokens=20, kv_dtype="int8",
                   continuous=True, wire_dtype=WIRE)
sids = [mgr.attach() for _ in range(B)]
rng = np.random.RandomState(0)
chunk = mgr.chunk_samp


def feed_all(n_chunks):
    for sid in sids:
        mgr.feed(sid, (rng.rand(n_chunks * chunk) * 0.4 - 0.2)
                 .astype(np.float32))


# warmup/compile
feed_all(2)
mgr.poll()
print(f"config: B={B} wire={WIRE} depth={DEPTH} chunk=1.6s (compiled)",
      file=sys.stderr)

if DEPTH <= 1:
    # serial: one chunk per poll -> the upload never overlaps the step
    t0 = time.perf_counter()
    for _ in range(STEPS):
        feed_all(1)
        mgr.poll()
    dt = time.perf_counter() - t0
else:
    # pipelined: everything buffered -> poll() stages chunk k+1's upload
    # while step k runs
    feed_all(STEPS)
    t0 = time.perf_counter()
    mgr.poll()
    dt = time.perf_counter() - t0

audio = B * STEPS * (mgr.chunk_mel / 100.0)
print(f"manager e2e: {dt / STEPS * 1e3:7.1f} ms/step -> "
      f"{audio / dt:6.1f} audio-s/s", file=sys.stderr)
