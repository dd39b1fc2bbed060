#!/usr/bin/env python3
"""Kernel-level feasibility of nibble-packed (int4) KV rings on v5e.

Packing convention (halves, no interleave anywhere): for one head of hd
lanes, packed byte c (c in [0, hd/2)) = (nibble of lane c + hd/2) << 4 |
(nibble of lane c). Scores then need TWO dots with the q halves:
  s = q[:, :hd/2] @ lo^T + q[:, hd/2:] @ hi^T
and PV writes the two output halves from two dots. Unpack is 2-3 VPU int8
ops per byte. This tool measures a decode-shaped attention-like kernel:
packed [P, blk/2] reads + unpack + dots vs the int8 baseline's
[P, blk] reads + one dot — is the byte halving realized as time?
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

B = int(os.environ.get("VOX_PROF_STREAMS", "32"))
P, HD, GROUP = 2088, 128, 4
BLK = 512                 # int8 lane block (4 kv sub-heads of hd=128)
L = 26


def bench(name, fn, *args, gb=None):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.device_get(out.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args)
    np.asarray(jax.device_get(out.ravel()[:1]))
    ms = (time.perf_counter() - t0) / 10 * 1e3
    bw = f" ({gb / ms * 1e3:5.0f} GB/s)" if gb else ""
    print(f"{name:40s} {ms:7.2f} ms/{L}L{bw}", file=sys.stderr)
    return ms


UNPACK = os.environ.get("VOX_UNPACK", "i32")


def unpack(x):
    """packed int8 [..., n] -> (lo, hi) signed int4 values.
    i32: shifts (int8 shifts don't legalize in Mosaic).
    f32: cast + floor — fewer register-expanding int ops."""
    if UNPACK == "f32":
        xf = x.astype(jnp.float32)
        hi = jnp.floor(xf * 0.0625)
        lo = xf - hi * 16.0
        # lo in [0,16) is the unsigned low nibble; sign-fix to [-8, 8)
        lo = lo - jnp.where(lo >= 8.0, 16.0, 0.0)
        return lo, hi
    xi = x.astype(jnp.int32)
    hi = jax.lax.shift_right_arithmetic(xi, 4)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(xi, 28), 28)
    return lo, hi


# ---- int8 baseline: [P, BLK] block, one dot per sub-head -------------------
def kern8(q_ref, k_ref, v_ref, o_ref):
    sub = BLK // HD
    for j in range(sub):
        k = k_ref[0, :, j * HD:(j + 1) * HD]
        q = q_ref[0, 0, j * GROUP * HD:(j + 1) * GROUP * HD].reshape(GROUP, HD)
        s = jax.lax.dot_general(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        e = jnp.exp(s - jnp.max(s, -1, keepdims=True)).astype(jnp.bfloat16)
        v = v_ref[0, :, j * HD:(j + 1) * HD]
        o = jax.lax.dot_general(e, v.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, j * GROUP * HD:(j + 1) * GROUP * HD] = (
            o.reshape(1, GROUP * HD).astype(o_ref.dtype))


def attn8(q, kr, vr):
    nb = kr.shape[2] // BLK
    return pl.pallas_call(
        kern8, grid=(B, nb),
        in_specs=[pl.BlockSpec((1, 1, GROUP * BLK), lambda i, n: (i, 0, n),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, P, BLK), lambda i, n: (i, 0, n),
                        memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, 1, GROUP * BLK), lambda i, n: (i, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, jnp.bfloat16),
    )(q, kr, vr)


# ---- packed int4: [P, BLK/2] block, unpack + two half dots -----------------
def kern4(q_ref, k_ref, v_ref, o_ref):
    sub = BLK // HD
    hh = HD // 2
    for j in range(sub):
        kp = k_ref[0, :, j * hh:(j + 1) * hh]          # [P, hd/2] packed
        klo, khi = unpack(kp)
        q = q_ref[0, 0, j * GROUP * HD:(j + 1) * GROUP * HD].reshape(GROUP, HD)
        q1, q2 = q[:, :hh], q[:, hh:]
        s = (jax.lax.dot_general(q1.astype(jnp.bfloat16),
                                 klo.astype(jnp.bfloat16),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(q2.astype(jnp.bfloat16),
                                   khi.astype(jnp.bfloat16),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32))
        e = jnp.exp(s - jnp.max(s, -1, keepdims=True)).astype(jnp.bfloat16)
        vp = v_ref[0, :, j * hh:(j + 1) * hh]
        vlo, vhi = unpack(vp)
        o1 = jax.lax.dot_general(e, vlo.astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o2 = jax.lax.dot_general(e, vhi.astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        c0 = j * GROUP * HD
        # concat restores the ORIGINAL lane order (lo = lanes [0, hh),
        # hi = lanes [hh, hd)) and makes the reshape 128-lane aligned
        o = jnp.concatenate([o1, o2], axis=1)          # [GROUP, HD]
        o_ref[0, :, c0:c0 + GROUP * HD] = (
            o.reshape(1, GROUP * HD).astype(o_ref.dtype))


def attn4(q, kr, vr):
    nb = kr.shape[2] // (BLK // 2)
    return pl.pallas_call(
        kern4, grid=(B, nb),
        in_specs=[pl.BlockSpec((1, 1, GROUP * BLK), lambda i, n: (i, 0, n),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, P, BLK // 2), lambda i, n: (i, 0, n),
                        memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, 1, GROUP * BLK), lambda i, n: (i, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, jnp.bfloat16),
    )(q, kr, vr)


rng = np.random.RandomState(0)
KV_DIM = 1024
q = jnp.asarray(rng.randn(B, 1, 4096) * 0.05, jnp.bfloat16)
kr = jnp.asarray(rng.randint(-127, 127, (B, P, KV_DIM), dtype=np.int8))
vr = jnp.asarray(rng.randint(-127, 127, (B, P, KV_DIM), dtype=np.int8))
krp = jnp.asarray(rng.randint(-128, 127, (B, P, KV_DIM // 2), dtype=np.int8))
vrp = jnp.asarray(rng.randint(-128, 127, (B, P, KV_DIM // 2), dtype=np.int8))


def chain(attn, q, kr, vr):
    def prog(q, kr, vr):
        acc = q
        for _ in range(L):
            acc = acc + 0.001 * attn(acc, kr, vr).astype(q.dtype)
        return acc
    return prog


gb8 = 2 * B * P * KV_DIM * L / 1e9
bench("int8  [P,512] one-dot", chain(attn8, q, kr, vr), q, kr, vr, gb=gb8)
bench("int4p [P,256] unpack+half-dots", chain(attn4, q, krp, vrp),
      q, krp, vrp, gb=gb8 / 2)

# numeric check: packed kernel == int8 kernel on identical int4-range values
B = 2   # attn8/attn4 read the global B at trace time
kn = rng.randint(-8, 8, (B, P, KV_DIM), dtype=np.int8)
vn = rng.randint(-8, 8, (B, P, KV_DIM), dtype=np.int8)
hh = HD // 2
k4 = kn.reshape(B, P, KV_DIM // HD, HD)
kp = ((k4[..., hh:] << 4) | (k4[..., :hh] & 0xF)).astype(np.int8)
v4 = vn.reshape(B, P, KV_DIM // HD, HD)
vp = ((v4[..., hh:] << 4) | (v4[..., :hh] & 0xF)).astype(np.int8)
qs = jnp.asarray(rng.randn(B, 1, 4096) * 0.05, jnp.bfloat16)
o8 = np.asarray(jax.jit(attn8)(qs, jnp.asarray(kn), jnp.asarray(vn)),
                np.float32)
o4 = np.asarray(jax.jit(attn4)(qs, jnp.asarray(kp.reshape(B, P, KV_DIM // 2)),
                               jnp.asarray(vp.reshape(B, P, KV_DIM // 2))),
                np.float32)
err = np.abs(o8 - o4).max()   # same lane order (concat restores it)
print(f"max |int8 - packed-int4| on identical values: {err:.5f}",
      file=sys.stderr)
