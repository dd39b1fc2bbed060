#!/usr/bin/env python3
"""Microbench of the decode-step components at production shapes (B streams,
Q8 weights, int8 KV ring 2048+40): fused ring attention, the per-layer Q8
matmul set (split vs merged QKV/w13), and the tied-embedding logits. Gives
the roofline slack per component that profile_phases.py can't attribute."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.ops.linear import embed_logits, linear
from voxtral_tpu.ops.pallas_attention import ring_gqa_attention
from voxtral_tpu.quant import Quantized

B = int(os.environ.get("VOX_PROF_STREAMS", "32"))
P = int(os.environ.get("VOX_PROF_RING", "2088"))
cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
d = cfg.decoder
rng = np.random.RandomState(0)


def mk(shape, dt=jnp.bfloat16, scale=0.05):
    return jnp.asarray((rng.rand(*shape) - 0.5) * scale).astype(dt)


def mkq(shape):
    return Quantized(
        q=jnp.asarray(rng.randint(-127, 127, shape, dtype=np.int8)),
        s=jnp.full((shape[1],), 0.01, jnp.float32))


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(name, fn, *args, iters=30, bytes_read=None):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    bw = f"  ({bytes_read / ms / 1e6:.0f} GB/s)" if bytes_read else ""
    print(f"{name:36s} {ms:8.3f} ms{bw}", file=sys.stderr)
    return ms


# ---- fused ring attention, int8 ring + scales + extra_kv(20) --------------
q = mk((B, 1, d.q_dim))
kr = jnp.asarray(rng.randint(-127, 127, (B, P, d.kv_dim), dtype=np.int8))
vr = jnp.asarray(rng.randint(-127, 127, (B, P, d.kv_dim), dtype=np.int8))
ks = jnp.full((B, d.kv_heads, P), 0.01, jnp.float32)
vs = jnp.full((B, d.kv_heads, P), 0.01, jnp.float32)
sp = jnp.asarray(np.tile(np.arange(P, dtype=np.int32), (B, 1)))
qp = jnp.full((B, 1), P + 10, jnp.int32)
xk = mk((B, 20, d.kv_dim))
xv = mk((B, 20, d.kv_dim))
xp = jnp.asarray(np.tile(P + np.arange(20, dtype=np.int32), (B, 1)))

attn = jax.jit(lambda q, kr, vr, sp, qp, ks, vs, xk, xv, xp:
               ring_gqa_attention(
                   q, kr, vr, sp, qp, window=d.window, heads=d.heads,
                   kv_heads=d.kv_heads, head_dim=d.head_dim,
                   k_scale=ks, v_scale=vs,
                   extra_k=xk, extra_v=xv, extra_pos=xp))
attn_bytes = B * P * d.kv_dim * 2 + B * d.kv_heads * P * 4 * 2
t_attn = timeit("ring attention (int8+scales+x20)", attn, q, kr, vr, sp, qp,
                ks, vs, xk, xv, xp, bytes_read=attn_bytes)

attn_sc = jax.jit(lambda q, kr, vr, sp, qp, ks, vs: ring_gqa_attention(
    q, kr, vr, sp, qp, window=d.window, heads=d.heads, kv_heads=d.kv_heads,
    head_dim=d.head_dim, k_scale=ks, v_scale=vs))
t_attn2 = timeit("ring attention (no extra_kv)", attn_sc, q, kr, vr, sp,
                 qp, ks, vs, bytes_read=attn_bytes)

attn_bf = jax.jit(lambda q, kr, vr, sp, qp: ring_gqa_attention(
    q, kr, vr, sp, qp, window=d.window, heads=d.heads, kv_heads=d.kv_heads,
    head_dim=d.head_dim))
kr_bf = mk((B, P, d.kv_dim))
vr_bf = mk((B, P, d.kv_dim))
t_attn3 = timeit("ring attention (bf16 ring)", attn_bf, q, kr_bf, vr_bf,
                 sp, qp, bytes_read=2 * B * P * d.kv_dim * 2)

# ---- per-layer matmul set (Q8): split vs merged ----------------------------
x = mk((B, 1, d.dim))
wq, wk, wv = mkq((d.dim, d.q_dim)), mkq((d.dim, d.kv_dim)), mkq((d.dim, d.kv_dim))
wo = mkq((d.q_dim, d.dim))
w1, w3 = mkq((d.dim, d.hidden)), mkq((d.dim, d.hidden))
w2 = mkq((d.hidden, d.dim))
layer_bytes = (d.dim * (d.q_dim + 2 * d.kv_dim) + d.q_dim * d.dim
               + 3 * d.dim * d.hidden)


def layer_split(x, wq, wk, wv, wo, w1, w3, w2):
    q = linear(x, wq); k = linear(x, wk); v = linear(x, wv)
    h = x + linear(q, wo)
    return h + linear(jax.nn.silu(linear(h, w1)) * linear(h, w3), w2)


t_split = timeit("layer matmuls (split q8)", jax.jit(layer_split),
                 x, wq, wk, wv, wo, w1, w3, w2, bytes_read=layer_bytes)

wqkv = mkq((d.dim, d.q_dim + 2 * d.kv_dim))
w13 = mkq((d.dim, 2 * d.hidden))


def layer_merged(x, wqkv, wo, w13, w2):
    qkv = linear(x, wqkv)
    q = qkv[..., :d.q_dim]
    h = x + linear(q, wo)
    a = linear(h, w13)
    return h + linear(jax.nn.silu(a[..., :d.hidden]) * a[..., d.hidden:], w2)


t_merged = timeit("layer matmuls (merged qkv+w13)", jax.jit(layer_merged),
                  x, wqkv, wo, w13, w2, bytes_read=layer_bytes)

# ---- logits -----------------------------------------------------------------
embq = mkq((131072, 3072))
embq = Quantized(q=embq.q, s=jnp.full((131072,), 0.01, jnp.float32))
h = mk((B, 3072))
logit_bytes = 131072 * 3072
t_log = timeit("embed logits (q8, 131072)",
               jax.jit(lambda h, q, s: jnp.argmax(
                   embed_logits(h, Quantized(q, s)), -1)),
               h, embq.q, embq.s, bytes_read=logit_bytes)

print(f"\nper decode iter (26 layers): attention {26*t_attn:.1f} ms + "
      f"matmuls {26*t_split:.1f} ms + logits {t_log:.2f} ms = "
      f"{26*(t_attn+t_split)+t_log:.1f} ms", file=sys.stderr)
print(f"merged-matmul variant would save {26*(t_split-t_merged):.1f} ms/iter",
      file=sys.stderr)
