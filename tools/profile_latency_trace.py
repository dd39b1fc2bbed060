#!/usr/bin/env python3
"""Per-feed trace of the B=1 serving path: which feeds are slow, and what
happened on them (monitor symbols: restarts, streak severity, steps run).

Chasing the reproducible p95 ~380 ms outliers at chunk6 + alt-on (3 bench
sightings, absent at alt-off and chunk2): prints one line per feed with
wall ms, steps taken inside the poll, and the slot's monitor events, so
the spike correlates (or doesn't) with watchdog restarts / double-steps.

Usage: VOX_PROF_FEEDS=70 python tools/profile_latency_trace.py [alt_off]
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
from voxtral_tpu.runtime.manager import FleetManager
from voxtral_tpu.weights import random_params_device

FEEDS = int(os.environ.get("VOX_PROF_FEEDS", "70"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    alt_off = "alt_off" in sys.argv[1:]
    log(f"device: {jax.devices()[0]}; alt={'off' if alt_off else 'on'}")
    cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    params = quantize_params(random_params_device(cfg, seed=0))
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
    log(f"Q8 params ready in {time.perf_counter() - t0:.1f}s")

    events = []
    mgr = FleetManager(params, cfg, batch=1, chunk_tokens=6, dec_ring=2048,
                       kv_dtype="int8", continuous=True,
                       n_alt=1 if alt_off else 2, alt_cutoff=0.95,
                       monitor=lambda sid, sym: events.append(sym))
    mgr.attach()
    rng = np.random.RandomState(1)

    for i in range(12 + FEEDS):
        pcm = ((rng.rand(mgr.chunk_samp) - 0.5) * 0.2).astype(np.float32)
        steps0 = mgr.steps
        events.clear()
        t0 = time.perf_counter()
        mgr.feed(0, pcm)
        mgr.poll()
        ms = (time.perf_counter() - t0) * 1e3
        if i >= 12:
            log(f"feed {i - 12:3d}: {ms:7.1f} ms  steps={mgr.steps - steps0} "
                f"events={''.join(events)}")


if __name__ == "__main__":
    main()
