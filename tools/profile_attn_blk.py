#!/usr/bin/env python3
"""Sweep the ring-attention kernel's lane-block width (VOX_ATTN_BLK) for the
two production shapes, measured in-program (32/26 chained calls per jit):
  encoder: S=80 queries, MHA 32x64 (kv_dim 2048), ring ~1104, int8+scales
  decoder: S=1 query, GQA 32/8 x128 (kv_dim 1024), ring 2088, int8+scales
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b

B = int(os.environ.get("VOX_PROF_STREAMS", "16"))
cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
rng = np.random.RandomState(0)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.device_get(out.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(out.ravel()[:1]))
    return (time.perf_counter() - t0) / iters * 1e3


def bench_shape(name, s, heads, kv_heads, hd, p, window, layers, blks,
                sx=None):
    sx = sx or s                  # extra_kv columns (decode: pending block)
    kv_dim = kv_heads * hd
    q0 = jnp.asarray((rng.rand(B, s, heads * hd) - 0.5), jnp.bfloat16)
    kr = jnp.asarray(rng.randint(-127, 127, (B, p, kv_dim), dtype=np.int8))
    vr = jnp.asarray(rng.randint(-127, 127, (B, p, kv_dim), dtype=np.int8))
    ks = jnp.full((B, kv_heads, p), 0.01, jnp.float32)
    vs = jnp.full((B, kv_heads, p), 0.01, jnp.float32)
    sp = jnp.asarray(np.tile(np.arange(p, dtype=np.int32), (B, 1)))
    qpos = jnp.asarray(np.tile(p + np.arange(s, dtype=np.int32), (B, 1)))
    xpos = jnp.asarray(np.tile(p + np.arange(sx, dtype=np.int32), (B, 1)))
    xk = jnp.asarray((rng.rand(B, sx, kv_dim) - 0.5), jnp.bfloat16)
    xv = xk + 0.1
    gb = (2 * B * p * kv_dim + 2 * B * kv_heads * p * 4) * layers / 1e9

    for blk in blks:
        os.environ["VOX_ATTN_BLK"] = str(blk)
        # the kernel reads the env var at TRACE time — drop every cached
        # trace so the new width actually takes effect
        jax.clear_caches()
        from voxtral_tpu.ops.pallas_attention import ring_gqa_attention

        def prog(q0, kr, vr, sp, qpos, xk, xv, _blk=blk):
            h = q0
            for _ in range(layers):
                h = h + 0.001 * ring_gqa_attention(
                    h, kr, vr, sp, qpos, window=window, heads=heads,
                    kv_heads=kv_heads, head_dim=hd, k_scale=ks, v_scale=vs,
                    extra_k=xk, extra_v=xv, extra_pos=xpos)
            return h

        try:
            ms = timeit(jax.jit(prog), q0, kr, vr, sp, qpos, xk, xv)
            print(f"{name} blk={blk:5d}: {ms:7.2f} ms/{layers}L "
                  f"({ms / layers * 1e3:6.0f} us/layer, {gb / ms * 1e3:4.0f} GB/s)",
                  file=sys.stderr)
        except Exception as ex:
            print(f"{name} blk={blk:5d}: FAILED {type(ex).__name__}: "
                  f"{str(ex)[:100]}", file=sys.stderr)
    os.environ.pop("VOX_ATTN_BLK", None)


bench_shape("encoder S=80", 80, 32, 32, 64, 1104, 750, 32,
            blks=(128, 256, 512, 1024, 2048))
bench_shape("decoder S=1 ", 1, 32, 8, 128, 2088, 8192, 26,
            blks=(128, 256, 512, 1024), sx=20)
