#!/usr/bin/env python3
"""VoxStream B=1 throughput: fused (B=1 FleetManager delegate) vs
bucketed backend, on 1 s feeds (VERDICT r3 next #2's ">= 2x current
throughput" checkpoint) and on a long stream.

Configs swept: backend x kv_dtype (the fused backend can run int8 KV
rings like the serving fleet; bucketed is float-only). Short run = 180 s
of audio in 1 s feeds at interval 1.0 (fresh-ish contexts, ring 8192
never fills); VOX_PROF_MINUTES sets an optional long run.

Usage: VOX_PROF_Q8=1 python tools/profile_voxstream.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.quant import quantize_params
from voxtral_tpu.runtime.stream import StreamConfig, VoxStream
from voxtral_tpu.weights import random_params_device

SECS = int(os.environ.get("VOX_PROF_SECS", "180"))
MINUTES = float(os.environ.get("VOX_PROF_MINUTES", "0"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def run(params, cfg, backend, kv, secs, interval=1.0):
    s = VoxStream(params, cfg, stream_cfg=StreamConfig(
        interval=interval, backend=backend, kv_dtype=kv))
    rng = np.random.RandomState(7)
    feeds = [((rng.rand(16000) - 0.5) * 0.4).astype(np.float32)
             for _ in range(16)]
    # warmup (compile): first feeds
    t0 = time.perf_counter()
    for i in range(8):
        s.feed(feeds[i % 16])
    log(f"  warmup/compile: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for i in range(secs - 8):
        s.feed(feeds[i % 16])
    dt = time.perf_counter() - t0
    rate = (secs - 8) / dt
    log(f"  {backend}/{kv}: {secs - 8} s audio in {dt:.1f} s = "
        f"{rate:.1f} audio-s/s ({s.n_generated} tokens so far)")
    return rate


def main():
    log(f"device: {jax.devices()[0]}")
    cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    params = random_params_device(cfg, seed=0)
    if os.environ.get("VOX_PROF_Q8", "1") == "1":
        params = quantize_params(params)
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
    log(f"params ready in {time.perf_counter() - t0:.1f}s")

    for backend, kv in (("fused", "float"), ("fused", "int8"),
                        ("bucketed", "float")):
        log(f"config: backend={backend} kv={kv}, 1 s feeds, interval 1.0")
        try:
            run(params, cfg, backend, kv, SECS)
        except Exception as e:
            log(f"  FAILED: {type(e).__name__}: {str(e)[:160]}")

    if MINUTES > 0:
        secs = int(MINUTES * 60)
        log(f"long-form {MINUTES:.0f} min, fused/int8, interval 2.0:")
        run(params, cfg, "fused", "int8", secs, interval=2.0)


if __name__ == "__main__":
    main()
