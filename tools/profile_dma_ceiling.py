#!/usr/bin/env python3
"""Pure-read ceiling for the decode-attention access pattern: a Pallas
kernel that DMAs the same [1, P, blk] int8 ring blocks (grid (B, nb)) and
does a trivial reduction. If this also tops out near ~470 GB/s, the fused
attention kernel is DMA-floor-bound and not worth further MXU tuning."""
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
P, KV_DIM, L = 2088, 1024, 26


def read_kernel(s_ref, k_ref, v_ref, o_ref):
    ksum = jnp.sum(k_ref[0].astype(jnp.float32), axis=0, keepdims=True)
    vsum = jnp.sum(v_ref[0].astype(jnp.float32), axis=0, keepdims=True)
    o_ref[0] = (ksum + vsum + s_ref[0, 0]).astype(o_ref.dtype)


def rd(kr, vr, salt, *, blk):
    # salt: [1, 1] f32 scalar carried between iterations — a sequential
    # data dependency (like real decode) that defeats CSE of the L calls
    # without adding measurable traffic
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


rng = np.random.RandomState(0)
gb = 2 * B * P * KV_DIM * L / 1e9
for blk in (256, 512, 1024):
    kr = jnp.asarray(rng.randint(-127, 127, (B, P, KV_DIM), dtype=np.int8))
    vr = jnp.asarray(rng.randint(-127, 127, (B, P, KV_DIM), dtype=np.int8))

    def prog(kr, vr, _blk=blk):
        acc = jnp.zeros((B, 1, KV_DIM), jnp.float32)
        for _ in range(L):
            salt = acc[:1, 0, :1] * 1e-9
            acc = acc + rd(kr, vr, salt, blk=_blk)
        return acc

    f = jax.jit(prog)
    out = f(kr, vr)
    np.asarray(jax.device_get(out.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(kr, vr)
    np.asarray(jax.device_get(out.ravel()[:1]))
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"pure-read blk={blk:5d}: {ms:7.2f} ms/{L}L "
          f"({gb / ms * 1e3:5.0f} GB/s)", file=sys.stderr)
