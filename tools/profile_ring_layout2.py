#!/usr/bin/env python3
"""Does a block-major ring layout beat lane-slicing on pure-read bandwidth?

Current decode rings are [B, P, 1024] int8 read as two [1, P, 512] lane
blocks per stream (grid (B, 2)) — each DMA row is a 512-byte segment
strided 1024 in HBM. Candidates:
  a) lane-sliced  [B, P, 1024], blk 512   (current)
  b) whole-row    [B, P, 1024], blk 1024  (contiguous, 1 cell/stream)
  c) block-major  [B, 2, P, 512]          (contiguous, 2 cells/stream)
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
P, KV_DIM, L = 2088, 1024, 26
rng = np.random.RandomState(0)
gb = 2 * B * P * KV_DIM * L / 1e9


def bench(name, prog, *args):
    f = jax.jit(prog)
    out = f(*args)
    np.asarray(jax.device_get(out.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args)
    np.asarray(jax.device_get(out.ravel()[:1]))
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:36s} {ms:7.2f} ms/{L}L ({gb / ms * 1e3:5.0f} GB/s)",
          file=sys.stderr)


def read_kernel(s_ref, k_ref, v_ref, o_ref):
    k = k_ref[0] if k_ref.ndim == 3 else k_ref[0, 0]
    v = v_ref[0] if v_ref.ndim == 3 else v_ref[0, 0]
    ksum = jnp.sum(k.astype(jnp.float32), axis=0, keepdims=True)
    vsum = jnp.sum(v.astype(jnp.float32), axis=0, keepdims=True)
    o_ref[0] = (ksum + vsum + s_ref[0, 0]).astype(o_ref.dtype)


def rd_flat(kr, vr, salt, *, blk):
    nb = KV_DIM // blk
    return pl.pallas_call(
        read_kernel, grid=(B, nb),
        in_specs=[pl.BlockSpec((1, 1), lambda i, n: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [pl.BlockSpec((1, P, blk), lambda i, n: (i, 0, n),
                        memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, 1, blk), lambda i, n: (i, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, KV_DIM), jnp.float32),
    )(salt, kr, vr)


def rd_blockmajor(kr, vr, salt, *, blk):
    nb = KV_DIM // blk
    return pl.pallas_call(
        read_kernel, grid=(B, nb),
        in_specs=[pl.BlockSpec((1, 1), lambda i, n: (0, 0),
                               memory_space=pltpu.SMEM)]
        + [pl.BlockSpec((1, 1, P, blk), lambda i, n: (i, n, 0, 0),
                        memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, 1, blk), lambda i, n: (i, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, KV_DIM), jnp.float32),
    )(salt, kr, vr)


def chained(rd, kr, vr, blk):
    def prog(kr, vr):
        acc = jnp.zeros((B, 1, KV_DIM), jnp.float32)
        for _ in range(L):
            salt = acc[:1, 0, :1] * 1e-9
            acc = acc + rd(kr, vr, salt, blk=blk)
        return acc
    return prog


kr = jnp.asarray(rng.randint(-127, 127, (B, P, KV_DIM), dtype=np.int8))
vr = jnp.asarray(rng.randint(-127, 127, (B, P, KV_DIM), dtype=np.int8))
bench("a) lane-sliced [B,P,1024] blk=512", chained(rd_flat, kr, vr, 512),
      kr, vr)
# whole-row blk=1024 omitted: the kernel body's f32 cast of a [P, 1024]
# block exceeds the 16 MB scoped VMEM (same reason the attention kernel
# caps its lane block below kv_dim)
for blk in (256, 512):
    nb = KV_DIM // blk
    krb = jnp.asarray(np.ascontiguousarray(
        np.asarray(kr).reshape(B, P, nb, blk).transpose(0, 2, 1, 3)))
    vrb = jnp.asarray(np.ascontiguousarray(
        np.asarray(vr).reshape(B, P, nb, blk).transpose(0, 2, 1, 3)))
    bench(f"c) block-major [B,{nb},P,{blk}]",
          chained(rd_blockmajor, krb, vrb, blk), krb, vrb)


# d) multiple streams per grid cell: same bytes, G-fold bigger transfers
def read_kernel_g(s_ref, k_ref, v_ref, o_ref):
    # chunked reduce: a whole-block f32 cast would blow the 16 MB scoped
    # VMEM at G >= 4; the DMA (what we're measuring) is unaffected
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    step = 522                       # P = 2088 = 4 * 522
    for t in range(P // step):
        ks = k_ref[:, :, t * step:(t + 1) * step, :].astype(jnp.float32)
        vs = v_ref[:, :, t * step:(t + 1) * step, :].astype(jnp.float32)
        acc = acc + jnp.sum(ks + vs, axis=-2, keepdims=True)
    o_ref[...] = acc + s_ref[0, 0]


for G, blk in ((4, 256), (8, 256), (4, 512)):
    nb = KV_DIM // blk

    def rd_g(kr, vr, salt, *, blk, G=G, nb=nb):
        return pl.pallas_call(
            read_kernel_g, grid=(B // G, nb),
            in_specs=[pl.BlockSpec((1, 1), lambda i, n: (0, 0),
                                   memory_space=pltpu.SMEM)]
            + [pl.BlockSpec((G, 1, P, blk), lambda i, n: (i, n, 0, 0),
                            memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((G, 1, 1, blk), lambda i, n: (i, n, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nb, 1, blk), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(salt, kr, vr)

    krb = jnp.asarray(np.ascontiguousarray(
        np.asarray(kr).reshape(B, P, nb, blk).transpose(0, 2, 1, 3)))
    vrb = jnp.asarray(np.ascontiguousarray(
        np.asarray(vr).reshape(B, P, nb, blk).transpose(0, 2, 1, 3)))

    def progg(kr, vr, _blk=blk, _rd=rd_g, _nb=nb):
        acc = jnp.zeros((B, _nb, 1, _blk), jnp.float32)
        for _ in range(L):
            salt = acc[:1, 0, 0, :1] * 1e-9
            acc = acc + _rd(kr, vr, salt, blk=_blk)
        return acc

    bench(f"d) {G} streams/cell [B,{nb},P,{blk}]", progg, krb, vrb)
