#!/usr/bin/env python3
"""Encoder matmul-stack variants (the 34 ms vs ~22 ms bf16-floor gap at
B=32 S=80, SPEED.md roadmap): unlike the decode stack (HBM-bound, Q8 wins
on bytes), the encoder chunk is FLOPs-bound — M = B x S = 2560 rows — so
the question is MXU efficiency per variant:

  1. split Q8 (current serving config: mixed bf16 x int8 dots)
  2. split bf16 (weights dequantized up front: +0.86 GB HBM)
  3. merged QKV + merged w1||w3, bf16 (the reference's Metal win,
     SPEED.md:45-65 — bigger N per dot = better MXU tiling when
     compute-bound, even though it bought nothing for the decode stack)
  4. merged, Q8

Env: VOX_PROF_STREAMS (32), VOX_PROF_CHUNK (80).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.ops.linear import linear
from voxtral_tpu.ops.norms import rms_norm
from voxtral_tpu.quant import Quantized, quantize_params
from voxtral_tpu.weights import random_params_device

B = int(os.environ.get("VOX_PROF_STREAMS", "32"))
S = int(os.environ.get("VOX_PROF_CHUNK", "80"))

cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
e = cfg.encoder


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(name, fn, layers, h, iters=20, flops=None):
    out = fn(layers, h)
    np.asarray(jax.device_get(out.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(layers, out)        # loop-carried (SPEED.md methodology)
    np.asarray(jax.device_get(out.ravel()[:1]))
    ms = (time.perf_counter() - t0) / iters * 1e3
    util = f"  ({flops / (ms * 1e9) / 197.0 * 100:.0f}% of 197 TF/s)" \
        if flops else ""
    log(f"{name:40s} {ms:8.2f} ms{util}")
    return ms


@jax.jit
def split_stack(layers, h):
    for lp in layers:
        x = rms_norm(h, lp["attn_norm"], e.norm_eps)
        q = linear(x, lp["wq"], lp["wq_b"])
        k = linear(x, lp["wk"])
        v = linear(x, lp["wv"], lp["wv_b"])
        attn = q + k + v
        h = h + linear(attn, lp["wo"], lp["wo_b"])
        x = rms_norm(h, lp["ffn_norm"], e.norm_eps)
        h = h + linear(jax.nn.silu(linear(x, lp["w1"])) * linear(x, lp["w3"]),
                       lp["w2"]) + lp["w2_b"].astype(h.dtype)
    return h


@jax.jit
def merged_stack(layers, h):
    """QKV as one [D, 3D] dot, w1||w3 as one [D, 2H] dot."""
    for lp in layers:
        x = rms_norm(h, lp["attn_norm"], e.norm_eps)
        qkv = linear(x, lp["wqkv"], lp["wqkv_b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = q + k + v
        h = h + linear(attn, lp["wo"], lp["wo_b"])
        x = rms_norm(h, lp["ffn_norm"], e.norm_eps)
        w13 = linear(x, lp["w13"])
        g, u = jnp.split(w13, 2, axis=-1)
        h = h + linear(jax.nn.silu(g) * u,
                       lp["w2"]) + lp["w2_b"].astype(h.dtype)
    return h


def merge_layers(layers, q8: bool):
    out = []
    for lp in layers:
        def cat(ws, axis=1):
            if q8:
                return Quantized(
                    q=jnp.concatenate([w.q for w in ws], axis=axis),
                    s=jnp.concatenate([w.s for w in ws]))
            return jnp.concatenate(ws, axis=axis)
        out.append({
            "attn_norm": lp["attn_norm"], "ffn_norm": lp["ffn_norm"],
            "wqkv": cat([lp["wq"], lp["wk"], lp["wv"]]),
            "wqkv_b": jnp.concatenate(
                [lp["wq_b"], jnp.zeros_like(lp["wq_b"]), lp["wv_b"]]),
            "wo": lp["wo"], "wo_b": lp["wo_b"],
            "w13": cat([lp["w1"], lp["w3"]]),
            "w2": lp["w2"], "w2_b": lp["w2_b"],
        })
    return tuple(out)


def main():
    log(f"device: {jax.devices()[0]}; B={B} S={S} (M={B * S})")
    rng = np.random.RandomState(0)
    params = random_params_device(cfg, seed=0)
    bf16_layers = params["encoder"]["layers"]
    h = jnp.asarray((rng.rand(B, S, e.dim) - 0.5).astype(np.float32) * 0.1,
                    cfg.compute_dtype)
    per_layer = (3 * e.dim * e.attn_dim + e.attn_dim * e.dim
                 + 3 * e.dim * e.hidden)
    flops = 2 * B * S * per_layer * e.layers

    # bf16 variants FIRST: quantize_params below DONATES the bf16 leaves
    timeit("split bf16", split_stack, bf16_layers, h, flops=flops)
    merged_bf16 = merge_layers(bf16_layers, False)
    timeit("merged bf16", merged_stack, merged_bf16, h, flops=flops)
    del merged_bf16
    qp = quantize_params(params)
    q8_layers = qp["encoder"]["layers"]
    timeit("split Q8 (current)", split_stack, q8_layers, h, flops=flops)
    timeit("merged Q8", merged_stack, merge_layers(q8_layers, True), h,
           flops=flops)


if __name__ == "__main__":
    main()
