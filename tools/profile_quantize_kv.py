#!/usr/bin/env python3
"""quantize_kv cost at the encoder fold shapes (64 tensors of [B, Sp, 2048]
bf16 -> int8 + [B, H, Sp] f32 scales per chunk). Theoretical floor is two
passes over the input (amax, then quantize) ~= 4 ms/chunk at B=32 Sp=80;
XLA measured ~14 ms. Variants probe what the lowering is losing."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.quant import quantize_kv

B = int(os.environ.get("VOX_PROF_STREAMS", "32"))
SP = int(os.environ.get("VOX_PROF_SP", "80"))
K, H, HD = 2048, 32, 64
N = 64   # tensors per encoder chunk (2 x 32 layers)

rng = np.random.RandomState(0)
xs = [jnp.asarray(rng.randn(B, SP, K) * 0.1, jnp.bfloat16)
      for _ in range(N)]


def bench(name, fn):
    f = jax.jit(fn)
    out = f(xs)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(xs)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:36s} {ms:8.2f} ms / {N} tensors", file=sys.stderr)
    return ms


def current(xs):
    return [quantize_kv(x, H, HD) for x in xs]


def bf16_math(xs):
    out = []
    for x in xs:
        x4 = x.reshape(B, SP, H, HD)
        amax = jnp.max(jnp.abs(x4), axis=-1)                  # bf16
        s = jnp.where(amax > 0, amax.astype(jnp.float32) / 127.0, 1.0)
        q = jnp.clip(jnp.round(x4.astype(jnp.float32) / s[..., None]),
                     -127, 127)
        out.append((q.astype(jnp.int8).reshape(B, SP, K),
                    jnp.swapaxes(s, 1, 2)))
    return out


def recip_mul(xs):
    out = []
    for x in xs:
        x4 = x.astype(jnp.float32).reshape(B, SP, H, HD)
        amax = jnp.max(jnp.abs(x4), axis=-1)
        s = jnp.where(amax > 0, amax / 127.0, 1.0)
        r = 1.0 / s
        q = jnp.clip(jnp.round(x4 * r[..., None]), -127, 127)
        out.append((q.astype(jnp.int8).reshape(B, SP, K),
                    jnp.swapaxes(s, 1, 2)))
    return out


def no_swap(xs):
    # scales produced directly in [B, H, SP] via a transposed reduce
    out = []
    for x in xs:
        x4 = x.astype(jnp.float32).reshape(B, SP, H, HD)
        amax = jnp.max(jnp.abs(x4), axis=-1)
        s = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(x4 / s[..., None]), -127, 127)
        out.append((q.astype(jnp.int8).reshape(B, SP, K), s))  # unswapped
    return out


bench("current (f32 cast + divide + swap)", current)
bench("bf16 amax, f32 quantize", bf16_math)
bench("reciprocal multiply", recip_mul)
bench("no scale swapaxes", no_swap)
