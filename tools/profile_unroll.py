#!/usr/bin/env python3
"""Decode-scan unroll sweep at the bf16+int8KV north-star config (B=24).

lax.scan(unroll=k) gives the TPU scheduler k consecutive token steps in one
loop body: one token's tail (logits/argmax read at ~410 GB/s, see
profile_logits.py) can overlap the next token's early layer-weight DMA.
Results are bit-identical (pure scheduling). Monkeypatches
models.decoder._SCAN_UNROLL + jax.clear_caches() between configs (the jit
cache key does not see the module global).

Usage: python tools/profile_unroll.py [unroll:B[:kv] ...]  (default
1:24:int8 2:24:int8 4:24:int8 2:25:int8)
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
from voxtral_tpu.models import decoder
from voxtral_tpu.models.decoder import ada_scales, time_conditioning
from voxtral_tpu.weights import random_params_device


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    configs = []
    for a in sys.argv[1:]:
        parts = a.split(":")
        configs.append((int(parts[0]), int(parts[1]),
                        parts[2] if len(parts) > 2 else "int8"))
    if not configs:
        configs = [(1, 24, "int8"), (2, 24, "int8"), (4, 24, "int8"),
                   (2, 25, "int8")]
    log(f"device: {jax.devices()[0]}")
    cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    params = random_params_device(cfg, seed=0)
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
    log(f"params ready in {time.perf_counter() - t0:.1f}s")
    t_ada = ada_scales(params["decoder"],
                       time_conditioning(cfg.streaming.delay_tokens,
                                         cfg.decoder.dim))
    for unroll, batch, kv in configs:
        decoder._SCAN_UNROLL = unroll
        jax.clear_caches()
        log(f"config: unroll={unroll} B={batch} kv={kv}")
        try:
            fresh, fresh_ms, steady = pb.run_config(params, cfg, t_ada,
                                                    batch, kv)
            log(f"  RESULT unroll={unroll} B={batch} kv={kv}: "
                f"fresh {fresh:.1f} audio-s/s ({fresh_ms:.1f} ms/step) | "
                f"steady {steady:.1f} audio-s/s")
        except Exception as e:  # OOM etc
            log(f"  FAILED unroll={unroll} B={batch}: "
                f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
