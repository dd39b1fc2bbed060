#!/usr/bin/env python3
"""Is the s8 x s8 -> s32 MXU path faster than bf16 x s8 for decode matmuls?

The current Q8 dot (dot_general(bf16 activations, int8 weights)) makes XLA
convert every weight byte to bf16 on the VPU before the MXU pass — a
conversion pass over ~3.4 GB/iter. v5e has a native int8 MXU mode; if
dot_general(int8, int8, preferred=int32) lowers to it, the matmul becomes
pure-DMA-bound. W8A8 = dynamic per-token activation quant (amax/127) +
per-column weight scales.
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
from voxtral_tpu.quant import Quantized

B = int(os.environ.get("VOX_PROF_STREAMS", "32"))
cfg = voxtral_4b()
d = cfg.decoder
L = d.layers
rng = np.random.RandomState(0)


def mkq(shape):
    return Quantized(
        q=jnp.asarray(rng.randint(-127, 127, shape, dtype=np.int8)),
        s=jnp.full((shape[1],), 0.01, jnp.float32))


layers = [dict(wq=mkq((d.dim, d.q_dim)), wk=mkq((d.dim, d.kv_dim)),
               wv=mkq((d.dim, d.kv_dim)), wo=mkq((d.q_dim, d.dim)),
               w1=mkq((d.dim, d.hidden)), w3=mkq((d.dim, d.hidden)),
               w2=mkq((d.hidden, d.dim))) for _ in range(L)]
layer_bytes = (d.dim * (d.q_dim + 2 * d.kv_dim) + d.q_dim * d.dim
               + 3 * d.dim * d.hidden)
gb = L * layer_bytes / 1e9
x0 = jnp.asarray(rng.randn(B, 1, d.dim) * 0.02, jnp.bfloat16)


def act_q8(x):
    """[..., K] bf16 -> (int8 values, [...] f32 per-row scales)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-10) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def lin_w8a8(x, w: Quantized):
    q, s = act_q8(x)
    acc = jax.lax.dot_general(q, w.q, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * s * w.s).astype(x.dtype)


def stack(lin, x, layers):
    for lp in layers:
        q = lin(x, lp["wq"])
        k = lin(x, lp["wk"])
        v = lin(x, lp["wv"])
        a = (q + jnp.concatenate([k, v, k, v], -1)) * 1e-3
        h = x + lin(a, lp["wo"])
        x = h + lin(jax.nn.silu(lin(h, lp["w1"])) * lin(h, lp["w3"]),
                    lp["w2"]) * 1e-3
    return x


def bench(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {ms:8.2f} ms ({gb / ms * 1e3:5.0f} GB/s)",
          file=sys.stderr)
    return ms


bench(f"26L bf16 x s8 (current, B={B})",
      lambda x, ls: stack(linear, x, ls), x0, layers)
bench(f"26L W8A8 s8 x s8 -> s32 (B={B})",
      lambda x, ls: stack(lin_w8a8, x, ls), x0, layers)
