#!/usr/bin/env python3
"""Attribute the steady-state encoder chunk cost with component stubs.

profile_encoder_parts.py times attention/matmuls in isolation but misses
the state machinery (pending quantize+fold, slot tables, pending rebuild)
and measures a fresh (empty-ring) state. Here each variant is the REAL
encoder_incremental loop (inlined) on an AGED state, donated + loop-carried,
with one component stubbed at a time:
  full          everything (== models/encoder.py semantics)
  no-attn       ring_attention replaced by x (measures matmuls + state)
  no-fold       pending quantize+fold skipped (rings stale — timing only)
  no-pending    chunk KV not re-packed into pending buffers
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.models.encoder import init_encoder_state
from voxtral_tpu.ops import apply_rope, rms_norm, rope_angles
from voxtral_tpu.ops.linear import linear
from voxtral_tpu.ops.pallas_attention import ring_attention
from voxtral_tpu.quant import quantize_kv, quantize_params
from voxtral_tpu.weights import random_params_device

B = int(os.environ.get("VOX_PROF_STREAMS", "32"))
S = int(os.environ.get("VOX_PROF_CHUNK", "80"))
RING = int(os.environ.get("VOX_PROF_ENC_RING", "912"))
PEND = int(os.environ.get("VOX_PROF_PENDING", "160"))

cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
e = cfg.encoder
params = quantize_params(random_params_device(cfg, seed=0))
enc_p_dev = params["encoder"]   # passed as a jit ARG: closed-over
# device arrays are baked into the HLO as constants and the multi-GB
# request body kills the remote-compile endpoint (see profile_phases.py)
rng = np.random.RandomState(0)
SLOT_INVALID = -(1 << 30)


def enc_step(state, enc_p, h_chunk, *, attn=True, fold=True, pending=True):
    """Inlined encoder_incremental (models/encoder.py:160-262) with stubs."""
    b, s, _ = h_chunk.shape
    sp_cap = state.pending_sp.shape[1]
    phys = state.k_ring[0].shape[1]
    ring = phys - sp_cap
    n_valid = jnp.full((b,), s, jnp.int32)
    rows = jnp.arange(s, dtype=jnp.int32)
    positions = state.next_pos[:, None] + rows[None, :]
    cos, sin = rope_angles(positions, e.head_dim, e.rope_theta)
    chunk_pos = positions

    slot0 = state.write_ctr % ring
    if fold:
        def do_fold(ring_t, pend_t, scale_t):
            rings, scales = [], []
            for r, p, sc in zip(ring_t, pend_t, scale_t):
                if fold == "noquant":
                    # DUS cost only: cast without amax/divide/round; no
                    # scale write (isolates the quantize math)
                    qv = jax.lax.convert_element_type(p, jnp.int8)
                    qs = None
                else:
                    qv, qs = quantize_kv(p, e.heads, e.head_dim)
                if qs is None or fold == "noscale":
                    scales.append(sc)
                else:
                    scales.append(
                        jax.lax.dynamic_update_slice(sc, qs, (0, 0, slot0)))
                if fold == "noring":
                    # keep ALL of qv live via a reduce so the quantize math
                    # isn't DCE'd with the dropped ring write (the sum adds
                    # a little VPU time of its own)
                    chk = jnp.sum(qv.astype(jnp.int32)).astype(r.dtype)
                    rings.append(r.at[0, 0, 0].add(chk))
                else:
                    rings.append(
                        jax.lax.dynamic_update_slice(r, qv, (0, slot0, 0)))
            return tuple(rings), tuple(scales)
        krs, kss = do_fold(state.k_ring, state.pending_k, state.k_scale)
        vrs, vss = do_fold(state.v_ring, state.pending_v, state.v_scale)
        rsp = jax.lax.dynamic_update_slice(
            state.slot_pos, state.pending_sp, (0, slot0))
    else:
        krs, kss, vrs, vss = (state.k_ring, state.k_scale,
                              state.v_ring, state.v_scale)
        rsp = state.slot_pos
    base = state.write_ctr + state.pending_adv
    nv_slots = jnp.minimum(state.write_ctr + sp_cap, phys)

    h = h_chunk
    chunk_ks, chunk_vs = [], []
    for l, lp in enumerate(enc_p["layers"]):
        x = rms_norm(h, lp["attn_norm"], e.norm_eps)
        hs = (b, s, e.heads, e.head_dim)
        q = linear(x, lp["wq"], lp["wq_b"]).reshape(hs)
        k = linear(x, lp["wk"]).reshape(hs)
        v = linear(x, lp["wv"], lp["wv_b"]).reshape(hs)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kd = k.reshape(b, s, e.attn_dim).astype(state.pending_k[l].dtype)
        vd = v.reshape(b, s, e.attn_dim).astype(state.pending_v[l].dtype)
        chunk_ks.append(kd)
        chunk_vs.append(vd)
        if attn:
            a = ring_attention(
                q.reshape(b, s, e.attn_dim), krs[l], vrs[l], rsp, positions,
                window=e.window, heads=e.heads, kv_heads=e.heads,
                head_dim=e.head_dim, k_scale=kss[l], v_scale=vss[l],
                extra_kv=(kd, vd, chunk_pos), n_valid_slots=nv_slots)
        else:
            a = q * 0.9            # [b, s, heads, hd] -> attn_dim reshape ok
        h = h + linear(a.reshape(b, s, e.attn_dim), lp["wo"], lp["wo_b"])
        x = rms_norm(h, lp["ffn_norm"], e.norm_eps)
        ffn = linear(jax.nn.silu(linear(x, lp["w1"])) * linear(x, lp["w3"]),
                     lp["w2"])
        h = h + ffn + lp["w2_b"].astype(h.dtype)
    out = rms_norm(h, enc_p["norm"], e.norm_eps)

    if pending and s < sp_cap:
        pk = tuple(jax.lax.dynamic_update_slice(jnp.zeros_like(p), c, (0, 0, 0))
                   for p, c in zip(state.pending_k, chunk_ks))
        pv = tuple(jax.lax.dynamic_update_slice(jnp.zeros_like(p), c, (0, 0, 0))
                   for p, c in zip(state.pending_v, chunk_vs))
        psp = jax.lax.dynamic_update_slice(
            jnp.full_like(state.pending_sp, SLOT_INVALID), chunk_pos, (0, 0))
    elif pending:
        pk, pv, psp = tuple(chunk_ks), tuple(chunk_vs), chunk_pos
    else:
        pk, pv, psp = state.pending_k, state.pending_v, state.pending_sp
    new_state = state._replace(
        k_ring=krs, v_ring=vrs, k_scale=kss, v_scale=vss, slot_pos=rsp,
        pending_k=pk, pending_v=pv, pending_sp=psp,
        pending_adv=jnp.max(n_valid).astype(jnp.int32), write_ctr=base,
        next_pos=state.next_pos + n_valid)
    return new_state, out


def aged():
    st = init_encoder_state(cfg, ring_size=RING, batch=B, pending_size=PEND,
                            kv_dtype="int8")
    phys = st.slot_pos.shape[1]
    np_ = st.pending_sp.shape[1]
    ring = phys - np_
    pos0 = 8 * ring
    j = np.arange(phys)
    p = pos0 - ring + (j - pos0 % ring) % ring
    p[ring:] -= ring
    return st._replace(
        slot_pos=jnp.asarray(np.tile(p, (B, 1)), jnp.int32),
        write_ctr=jnp.int32(pos0),
        next_pos=jnp.full((B,), pos0, jnp.int32))


h = jnp.asarray((rng.rand(B, S, e.dim) - 0.5).astype(np.float32) * 0.1,
                cfg.compute_dtype)


def run(name, **stubs):
    f = jax.jit(partial(enc_step, **stubs), donate_argnums=0)
    st = aged()
    st, out = f(st, enc_p_dev, h)
    np.asarray(jax.device_get(out.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(10):
        st, out = f(st, enc_p_dev, h)
    np.asarray(jax.device_get(out.ravel()[:1]))
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:24s} {ms:8.2f} ms", file=sys.stderr)
    del st
    return ms


print(f"config: B={B} S={S} ring {RING} int8 KV, aged (ring full)",
      file=sys.stderr)
t_full = run("full")
t_na = run("no-attn", attn=False)
t_nf = run("no-fold", fold=False)
t_nq = run("fold-noquant (DUS only)", fold="noquant")
t_nr = run("fold-noring (quant only)", fold="noring")
t_ns = run("fold-noscale", fold="noscale")
t_np = run("no-pending", pending=False)
print(f"\nattention {t_full - t_na:.1f} ms | fold {t_full - t_nf:.1f} ms | "
      f"pending-rebuild {t_full - t_np:.1f} ms | "
      f"matmuls+rest {t_na - (t_full - t_nf) - (t_full - t_np):.1f} ms",
      file=sys.stderr)
