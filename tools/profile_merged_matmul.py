#!/usr/bin/env python3
"""In-program comparison of split vs merged decode-layer matmuls: one jit
runs 26 layers x NSTEP sequential token iterations (data dependency carried),
so per-dispatch tunnel overhead vanishes and what remains is the real
in-scan cost the fleet decode pays."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.ops.linear import linear
from voxtral_tpu.quant import Quantized

B = int(os.environ.get("VOX_PROF_STREAMS", "16"))
NSTEP = 8
cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
d = cfg.decoder
rng = np.random.RandomState(0)


def mkq(rows, cols):
    return Quantized(
        q=jnp.asarray(rng.randint(-127, 127, (rows, cols), dtype=np.int8)),
        s=jnp.full((cols,), 0.01, jnp.float32))


split_layers = [dict(
    wq=mkq(d.dim, d.q_dim), wk=mkq(d.dim, d.kv_dim), wv=mkq(d.dim, d.kv_dim),
    wo=mkq(d.q_dim, d.dim), w1=mkq(d.dim, d.hidden), w3=mkq(d.dim, d.hidden),
    w2=mkq(d.hidden, d.dim)) for _ in range(d.layers)]
merged_layers = [dict(
    wqkv=mkq(d.dim, d.q_dim + 2 * d.kv_dim), wo=mkq(d.q_dim, d.dim),
    w13=mkq(d.dim, 2 * d.hidden), w2=mkq(d.hidden, d.dim))
    for _ in range(d.layers)]
x0 = jnp.asarray((rng.rand(B, 1, d.dim) - 0.5).astype(np.float32) * 0.1,
                 jnp.bfloat16)


def run_split(layers, x):
    for _ in range(NSTEP):
        for lp in layers:
            q = linear(x, lp["wq"])
            k = linear(x, lp["wk"])
            v = linear(x, lp["wv"])
            a = q + jnp.concatenate([k] * 4, -1) + jnp.concatenate([v] * 4, -1)
            x = x + linear(a, lp["wo"])
            x = x + linear(jax.nn.silu(linear(x, lp["w1"]))
                           * linear(x, lp["w3"]), lp["w2"])
        x = x * 0.999
    return x


def run_merged(layers, x):
    for _ in range(NSTEP):
        for lp in layers:
            qkv = linear(x, lp["wqkv"])
            q = qkv[..., :d.q_dim]
            k = qkv[..., d.q_dim:d.q_dim + d.kv_dim]
            v = qkv[..., d.q_dim + d.kv_dim:]
            a = q + jnp.concatenate([k] * 4, -1) + jnp.concatenate([v] * 4, -1)
            x = x + linear(a, lp["wo"])
            g = linear(x, lp["w13"])
            x = x + linear(jax.nn.silu(g[..., :d.hidden])
                           * g[..., d.hidden:], lp["w2"])
        x = x * 0.999
    return x


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.device_get(out.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.device_get(out.ravel()[:1]))
    ms = (time.perf_counter() - t0) / iters / NSTEP * 1e3
    print(f"{name:40s} {ms:8.3f} ms/token-iter (26L)", file=sys.stderr)
    return ms


t_s = timeit("split q8 (wq,wk,wv + w1,w3)", run_split, split_layers, x0)
t_m = timeit("merged q8 (wqkv + w13)", run_merged, merged_layers, x0)
print(f"\nmerged saves {t_s - t_m:.3f} ms per decode iteration "
      f"({(t_s - t_m) / t_s * 100:.0f}%)", file=sys.stderr)
