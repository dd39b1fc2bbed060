#!/usr/bin/env python3
"""Attribute the encoder-chunk cost (profile_phases.py: ~52 ms at B=16)
between the 32 ring-attention kernels and the 32 layers' matmul stack.
Each variant is ONE jitted program (isolated per-op launches on the axon
tunnel are dominated by dispatch RTT and useless for attribution)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.models.encoder import encoder_incremental, init_encoder_state
from voxtral_tpu.ops.linear import linear
from voxtral_tpu.ops.norms import rms_norm
from voxtral_tpu.ops.pallas_attention import ring_gqa_attention
from voxtral_tpu.quant import quantize_params
from voxtral_tpu.weights import random_params_device

B = int(os.environ.get("VOX_PROF_STREAMS", "16"))
S = int(os.environ.get("VOX_PROF_CHUNK", "80"))   # post-conv positions
RING = int(os.environ.get("VOX_PROF_ENC_RING", "1024"))
Q8 = os.environ.get("VOX_PROF_Q8", "1") == "1"
KV = os.environ.get("VOX_PROF_KV", "int8")

cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
e = cfg.encoder
params = random_params_device(cfg, seed=0)
if Q8:
    params = quantize_params(params)
enc_p = params["encoder"]
rng = np.random.RandomState(0)


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {ms:8.2f} ms", file=sys.stderr)
    return ms


h = jnp.asarray((rng.rand(B, S, e.dim) - 0.5).astype(np.float32) * 0.1,
                cfg.compute_dtype)

# ---- full encoder chunk (state threaded, non-donated) ----------------------
state = init_encoder_state(cfg, ring_size=RING, batch=B, pending_size=S,
                           kv_dtype=KV)
full = jax.jit(lambda p, st, h: encoder_incremental(p, cfg, st, h))
t_full = timeit("encoder chunk (32L, full)", full, enc_p, state, h)

# ---- matmul stack only (attention replaced by x) ----------------------------
def matmuls_only(p, h):
    for lp in p["layers"]:
        x = rms_norm(h, lp["attn_norm"], e.norm_eps)
        q = linear(x, lp["wq"], lp["wq_b"])
        k = linear(x, lp["wk"])
        v = linear(x, lp["wv"], lp["wv_b"])
        attn = q + k + v                       # stand-in for attention
        h = h + linear(attn, lp["wo"], lp["wo_b"])
        x = rms_norm(h, lp["ffn_norm"], e.norm_eps)
        h = h + linear(jax.nn.silu(linear(x, lp["w1"])) * linear(x, lp["w3"]),
                       lp["w2"]) + lp["w2_b"].astype(h.dtype)
    return h

t_mm = timeit("matmul stack only (32L)", jax.jit(matmuls_only), enc_p, h)

# ---- 32x ring attention only ------------------------------------------------
P = state.k_ring[0].shape[1]
kr = state.k_ring[0]
vr = state.v_ring[0]
ks = None if state.k_scale is None else state.k_scale[0]
vs = None if state.k_scale is None else state.v_scale[0]
sp = jnp.asarray(np.tile(np.arange(P, dtype=np.int32), (B, 1)))
qpos = jnp.asarray(np.tile(P + np.arange(S, dtype=np.int32), (B, 1)))
xk = jnp.asarray((rng.rand(B, S, e.attn_dim) - 0.5).astype(np.float32),
                 cfg.compute_dtype)
xv = xk + 0.1


def attn_only(q0, kr, vr, sp, qpos, xk, xv):
    h = q0
    for _ in range(e.layers):
        h = h + 0.001 * ring_gqa_attention(
            h, kr, vr, sp, qpos, window=e.window, heads=e.heads,
            kv_heads=e.heads, head_dim=e.head_dim, k_scale=ks, v_scale=vs,
            extra_k=xk, extra_v=xv, extra_pos=qpos)
    return h

t_at = timeit("ring attention only (32L)", jax.jit(attn_only),
              xk, kr, vr, sp, qpos, xk, xv)

print(f"\nattention {t_at:.1f} + matmuls {t_mm:.1f} = {t_at + t_mm:.1f} "
      f"vs full {t_full:.1f} ms", file=sys.stderr)
