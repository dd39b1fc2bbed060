#!/usr/bin/env python3
"""Test: does a lane-contiguous ring layout [B, nb, P, blk] beat the
production [B, P, kv_dim] layout for the fused decode attention? In the 3D
layout each grid cell DMAs [P, blk] = P short strided rows; in 4D the block
is one contiguous P*blk span. Minimal kernel (scores+mask+softmax+PV,
int8+scales, no extra_kv) so the layouts are the only variable."""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("VOX_PROF_STREAMS", "16"))
P, HKV, HD, GROUP = 2088, 8, 128, 4
HEADS = HKV * GROUP
KV_DIM = HKV * HD
L = 26
_NEG = -1e30


def _cell(q_all, k_blk, v_blk, sp, qp, ks_row, vs_row, sub, group, hd, o_ref):
    scale = 1.0 / math.sqrt(hd)
    mask1 = (sp >= 0) & (sp <= qp) & (sp >= qp - 8191)      # [P]
    for j in range(sub):
        kd = k_blk[:, j * hd:(j + 1) * hd].astype(jnp.bfloat16)
        vd = v_blk[:, j * hd:(j + 1) * hd].astype(jnp.bfloat16)
        c0 = j * group * hd
        q_mat = q_all[0, c0:c0 + group * hd].reshape(group, hd)
        s1 = jax.lax.dot_general(q_mat, kd, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        s1 = s1 * ks_row[j][None, :]
        s1 = jnp.where(mask1[None, :], s1, _NEG)
        m = jnp.maximum(jnp.max(s1, -1, keepdims=True), _NEG / 2)
        e = jnp.where(mask1[None, :], jnp.exp(s1 - m), 0.0)
        den = jnp.maximum(jnp.sum(e, -1, keepdims=True), 1e-30)
        e = e * vs_row[j][None, :]
        o = jax.lax.dot_general(e.astype(jnp.bfloat16), vd,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / den
        o_ref[0, :, c0:c0 + group * hd] = (
            o.reshape(1, group * hd).astype(o_ref.dtype))


def attn3d(q, kr, vr, sp, qp, ks, vs, *, blk):
    nb = KV_DIM // blk
    sub = blk // HD
    qlanes = GROUP * blk

    def kernel(q_ref, k_ref, v_ref, sp_ref, qp_ref, ks_ref, vs_ref, o_ref):
        ks_rows = [ks_ref[0, 0, j] for j in range(sub)]
        vs_rows = [vs_ref[0, 0, j] for j in range(sub)]
        _cell(q_ref[0], k_ref[0], v_ref[0], sp_ref[0, 0], qp_ref[0, 0, 0],
              ks_rows, vs_rows, sub, GROUP, HD, o_ref)

    return pl.pallas_call(
        kernel, grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 1, qlanes), lambda i, n: (i, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, blk), lambda i, n: (i, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, blk), lambda i, n: (i, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, n: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, n: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, sub, P), lambda i, n: (i, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sub, P), lambda i, n: (i, n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, qlanes), lambda i, n: (i, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, HEADS * HD), q.dtype),
    )(q, kr, vr, sp, qp, ks, vs)


def attn4d(q, kr, vr, sp, qp, ks, vs, *, blk):
    nb = KV_DIM // blk
    sub = blk // HD
    qlanes = GROUP * blk

    def kernel(q_ref, k_ref, v_ref, sp_ref, qp_ref, ks_ref, vs_ref, o_ref):
        ks_rows = [ks_ref[0, 0, j] for j in range(sub)]
        vs_rows = [vs_ref[0, 0, j] for j in range(sub)]
        _cell(q_ref[0], k_ref[0, 0], v_ref[0, 0], sp_ref[0, 0],
              qp_ref[0, 0, 0], ks_rows, vs_rows, sub, GROUP, HD, o_ref)

    return pl.pallas_call(
        kernel, grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 1, qlanes), lambda i, n: (i, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, blk), lambda i, n: (i, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, blk), lambda i, n: (i, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i, n: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, n: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, sub, P), lambda i, n: (i, n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sub, P), lambda i, n: (i, n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, qlanes), lambda i, n: (i, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, HEADS * HD), q.dtype),
    )(q, kr, vr, sp, qp, ks, vs)


def timeit(name, prog, *args, iters=20, gb=None):
    f = jax.jit(prog)
    out = f(*args)
    np.asarray(jax.device_get(out.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.device_get(out.ravel()[:1]))
    ms = (time.perf_counter() - t0) / iters * 1e3
    bw = f" {gb / ms * 1e3:5.0f} GB/s" if gb else ""
    print(f"{name:34s} {ms:8.2f} ms/{L}L ({ms / L * 1e3:5.0f} us/layer{bw})",
          file=sys.stderr)
    return ms


rng = np.random.RandomState(0)
q = jnp.asarray((rng.rand(B, 1, HEADS * HD) - 0.5), jnp.bfloat16)
sp = jnp.asarray(np.tile(np.arange(P, dtype=np.int32), (B, 1))).reshape(B, 1, P)
qp = jnp.full((B, 1, 1), P + 10, jnp.int32)
gb = (2 * B * P * KV_DIM + 2 * B * HKV * P * 4) * L / 1e9

for blk in (256, 512, 1024):
    nb, sub = KV_DIM // blk, blk // HD
    kr3 = jnp.asarray(rng.randint(-127, 127, (B, P, KV_DIM), dtype=np.int8))
    vr3 = jnp.asarray(rng.randint(-127, 127, (B, P, KV_DIM), dtype=np.int8))
    ks = jnp.full((B, nb, sub, P), 0.01, jnp.float32)
    kr4 = jnp.asarray(rng.randint(-127, 127, (B, nb, P, blk), dtype=np.int8))
    vr4 = jnp.asarray(rng.randint(-127, 127, (B, nb, P, blk), dtype=np.int8))

    def prog3(q, kr, vr, sp, qp, ks, _blk=blk):
        h = q
        for _ in range(L):
            h = h + 0.001 * attn3d(h, kr, vr, sp, qp, ks, ks, blk=_blk)
        return h

    def prog4(q, kr, vr, sp, qp, ks, _blk=blk):
        h = q
        for _ in range(L):
            h = h + 0.001 * attn4d(h, kr, vr, sp, qp, ks, ks, blk=_blk)
        return h

    timeit(f"3D [B,P,{KV_DIM}] blk={blk}", prog3, q, kr3, vr3, sp, qp, ks,
           gb=gb)
    timeit(f"4D [B,{nb},P,{blk}] contiguous", prog4, q, kr4, vr4, sp, qp, ks,
           gb=gb)
