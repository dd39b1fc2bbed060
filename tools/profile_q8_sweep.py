#!/usr/bin/env python3
"""Q8-weights fleet sweep with configurable encoder-ring dtype.

Round 4: int4-packed encoder rings freed ~60 MB/stream and lifted the
bf16 fleet from B=26 to B=35. The Q8 headline (B=32, 203 fresh / 156-161
steady) was stream-count-limited by steady-state HBM pressure (B=36 at
int8 enc measured 210 fresh but steady DROPPED to 141.7, SPEED.md) —
int4 encoder rings halve exactly that pressure, so re-sweep.

Usage: python tools/profile_q8_sweep.py [B:enc_kv ...]
       default: 32:int8 32:int4 36:int4 40:int4 44:int4
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


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    configs = []
    for a in sys.argv[1:]:
        b, kv = a.split(":")
        configs.append((int(b), kv))
    if not configs:
        configs = [(32, "int8"), (32, "int4"), (36, "int4"), (40, "int4"),
                   (44, "int4")]
    log(f"device: {jax.devices()[0]}")
    cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    params = quantize_params(random_params_device(cfg, seed=0))
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
    log(f"Q8 params ready in {time.perf_counter() - t0:.1f}s")
    t_ada = ada_scales(params["decoder"],
                       time_conditioning(cfg.streaming.delay_tokens,
                                         cfg.decoder.dim))
    for batch, enc_kv in configs:
        log(f"config: B={batch} Q8 weights, int8 KV, enc rings {enc_kv}")
        try:
            fresh, fresh_ms, steady = pb.run_config(
                params, cfg, t_ada, batch, "int8",
                enc_kv_dtype=None if enc_kv == "int8" else enc_kv)
            log(f"  RESULT B={batch} Q8 enc_kv={enc_kv}: "
                f"fresh {fresh:.1f} audio-s/s ({fresh_ms:.1f} ms/step) | "
                f"steady {steady:.1f}")
        except Exception as e:
            log(f"  FAILED B={batch} enc_kv={enc_kv}: "
                f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
