#!/usr/bin/env python3
"""What do XLA's Q8 decode matmuls actually achieve, and what's the ceiling?

One compiled program runs the 26-layer decode matmul stack (no attention)
with loop-carried activations — the honest per-iteration matmul cost at
production shapes. Compared against a Pallas pure-read kernel over the same
weight arrays (the DMA ceiling for the weight access pattern) to size the
potential win of a custom fused Q8 matvec kernel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.ops.linear import embed_logits, linear
from voxtral_tpu.quant import Quantized

B = int(os.environ.get("VOX_PROF_STREAMS", "32"))
cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
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


def stack(x, layers):
    for lp in layers:
        q = linear(x, lp["wq"])
        k = linear(x, lp["wk"])
        v = linear(x, lp["wv"])
        a = (q + jnp.concatenate([k, v, k, v], -1)) * 1e-3   # stand-in attn
        h = x + linear(a, lp["wo"])
        x = h + linear(jax.nn.silu(linear(h, lp["w1"])) * linear(h, lp["w3"]),
                       lp["w2"]) * 1e-3
    return x


def bench(name, fn, *args, gbytes=gb, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {ms:8.2f} ms ({gbytes / ms * 1e3:5.0f} GB/s)",
          file=sys.stderr)
    return ms


bench(f"26L decode matmul stack (XLA q8, B={B})", stack, x0, layers)


# pure-read ceiling over the same weight arrays: each kernel reads one
# weight [K, N] in [K, blk] lane blocks (grid over N/blk), sums trivially
def read_kernel(w_ref, o_ref):
    o_ref[0, :] = jnp.sum(w_ref[...].astype(jnp.float32), axis=0)


def wread(w, blk=512):
    k, n = w.shape
    return pl.pallas_call(
        read_kernel, grid=(n // blk,),
        in_specs=[pl.BlockSpec((k, blk), lambda n: (0, n),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, blk), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
    )(w)


RL = 6   # pure-read over a few layers (compile time); GB/s is per-byte


def read_all(layers):
    acc = 0.0
    for lp in layers[:RL]:
        for nm in ("wq", "wk", "wv", "wo", "w1", "w3", "w2"):
            acc = acc + jnp.sum(wread(lp[nm].q)) * 1e-9
    return acc


bench(f"{RL}L pure-read ceiling (pallas, blk=512)", read_all, layers,
      gbytes=RL * layer_bytes / 1e9)

# logits matmul on top (tied embeddings 131072 x 3072)
emb = mkq((131072, d.dim))
h = jnp.asarray(rng.randn(B, d.dim) * 0.02, jnp.bfloat16)
bench("logits+argmax (q8 131072)",
      lambda h, q, s: jnp.argmax(embed_logits(h, Quantized(q, s)), -1),
      h, emb.q, emb.s, gbytes=131072 * d.dim / 1e9)
