#!/usr/bin/env python3
"""Round-3 combo runner: one ~16-min device params init (the tunnel's fixed
cost) shared across the remaining round-3 measurements:

  1. bf16 weights + int8 KV at B=27, decode-scan unroll 1 then 2 — does the
     extra stream fit now that encoder pending KV is int8? (B=26 @ unroll 4
     measured 117.7 fresh; the 125 target needs ~B=27.)
  2. quantize to Q8 and re-run the B=1 serving-latency phase breakdown +
     config variants (tools/profile_latency.py) on the PACKED wire — the
     post-packing re-measure queued by commit 33f137a.

Usage: python tools/run_r3_sweep.py [skip_b27]
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
import profile_latency as pl
from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.models import decoder
from voxtral_tpu.models.decoder import ada_scales, time_conditioning
from voxtral_tpu.quant import quantize_params
from voxtral_tpu.weights import random_params_device


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    skip_b27 = "skip_b27" in sys.argv[1:]
    log(f"device: {jax.devices()[0]}")
    cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    params = random_params_device(cfg, seed=0)
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
    log(f"bf16 params ready in {time.perf_counter() - t0:.1f}s")
    t_ada = ada_scales(params["decoder"],
                       time_conditioning(cfg.streaming.delay_tokens,
                                         cfg.decoder.dim))

    if not skip_b27:
        prev_unroll = decoder._SCAN_UNROLL
        for unroll in (1, 2):
            decoder._SCAN_UNROLL = unroll
            jax.clear_caches()
            log(f"config: unroll={unroll} B=27 kv=int8")
            try:
                fresh, fresh_ms, steady = pb.run_config(params, cfg, t_ada,
                                                        27, "int8")
                log(f"  RESULT unroll={unroll} B=27: fresh {fresh:.1f} "
                    f"audio-s/s ({fresh_ms:.1f} ms/step) | steady {steady:.1f}")
                break              # fits — no need to try the next unroll
            except Exception as e:
                log(f"  FAILED unroll={unroll} B=27: "
                    f"{type(e).__name__}: {str(e)[:160]}")
        decoder._SCAN_UNROLL = prev_unroll
        jax.clear_caches()

    t0 = time.perf_counter()
    params = quantize_params(params)
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
    log(f"quantized to Q8 in {time.perf_counter() - t0:.1f}s")
    pl.main(params=params, cfg=cfg)


if __name__ == "__main__":
    main()
