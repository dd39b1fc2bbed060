#!/usr/bin/env python3
"""Is 633 GB/s (XLA's bf16 decode-matmul weight-read rate,
profile_bf16_matmul.py) the platform ceiling, or is there headroom for a
custom matmul kernel? Measures, over one 6 GB bf16 weight-shaped working
set (26 x 4 decoder-layer tensors):

  1. Pallas pure-stream: read every weight block into VMEM, reduce a few
     lanes (no MXU) — the DMA ceiling for the weight access pattern.
  2. Pallas matmul: x [B, K] @ W [K, N] per layer with N-blocked grid,
     f32 accumulation — can a hand kernel hold the pure-stream rate while
     feeding the MXU?
  3. XLA baseline on the same tensors (the 633 GB/s reference point).

Loop-carried timing. VOX_PROF_STREAMS (24), VOX_PROF_BLK_N (1024).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B = int(os.environ.get("VOX_PROF_STREAMS", "24"))
BLK_N = int(os.environ.get("VOX_PROF_BLK_N", "1024"))
L = 26
DIM, QD, KD, HID = 3072, 4096, 1024, 9216


def log(m):
    print(m, file=sys.stderr, flush=True)


_key = [jax.random.PRNGKey(0)]


def _next_key():
    _key[0], k = jax.random.split(_key[0])
    return k


def mk(shape):
    return (jax.random.uniform(_next_key(), shape, jnp.float32) - 0.5
            ).astype(jnp.bfloat16) * 0.05


def layer_weights():
    # wk/wv merged into one KDx2 tensor to keep the tensor count down; the
    # byte total matches the real decoder layer
    return tuple(
        {"wq": mk((DIM, QD)), "wkv": mk((DIM, 2 * KD)), "wo": mk((QD, DIM)),
         "w13": mk((DIM, 2 * HID)), "w2": mk((HID, DIM))}
        for _ in range(L))


BLK_K = 1536      # K-blocked: a [9216, 1024] bf16 block would be 19 MB


def stream_kernel(w_ref, acc_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    blk = w_ref[:]                          # [BLK_K, BLK_N] bf16 in VMEM
    acc_ref[:] += blk[:8, :128].astype(jnp.float32)


def pure_stream(w):
    """Read all of w block-by-block; returns a tiny reduction."""
    k, n = w.shape
    bk = min(BLK_K, k)
    return pl.pallas_call(
        stream_kernel,
        grid=(n // BLK_N, k // bk),
        in_specs=[pl.BlockSpec((bk, BLK_N), lambda i, j: (j, i))],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(w)


def matmul_kernel(x_ref, w_ref, o_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def pallas_matmul(x, w):
    """x [B, K] @ w [K, N] -> f32 [B, N]; grid (N-blocks, K-blocks), K
    innermost so each output block accumulates in VMEM."""
    k, n = w.shape
    bk = min(BLK_K, k)
    return pl.pallas_call(
        matmul_kernel,
        grid=(n // BLK_N, k // bk),
        in_specs=[pl.BlockSpec((x.shape[0], bk), lambda i, j: (0, j)),
                  pl.BlockSpec((bk, BLK_N), lambda i, j: (j, i))],
        out_specs=pl.BlockSpec((x.shape[0], BLK_N), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], n), jnp.float32),
    )(x, w)


def time_carried(step, h0, layers, iters=15):
    h = step(h0, layers)
    np.asarray(jax.device_get(h.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        h = step(h, layers)
    np.asarray(jax.device_get(h.ravel()[:1]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    log(f"device: {jax.devices()[0]}; B={B} blk_n={BLK_N}")
    layers = layer_weights()
    nbytes = L * 2 * (DIM * QD + 2 * DIM * KD + QD * DIM + 2 * DIM * HID
                      + HID * DIM)
    log(f"working set: {nbytes / 1e9:.2f} GB bf16")

    @jax.jit
    def xla_step(x, layers):
        for lp in layers:
            q = x @ lp["wq"]
            kv = x @ lp["wkv"]
            o = q @ lp["wo"]
            h13 = x @ lp["w13"]
            g, u = jnp.split(h13, 2, axis=-1)
            x = (o + (jax.nn.silu(g) * u) @ lp["w2"]
                 + kv.sum(-1, keepdims=True) * 0).astype(jnp.bfloat16)
        return x

    @jax.jit
    def stream_step(x, layers):
        acc = x[:8, :128].astype(jnp.float32)
        for lp in layers:
            for wname in ("wq", "wkv", "wo", "w13", "w2"):
                acc += pure_stream(lp[wname])
        return (x + acc[:1, :1].astype(jnp.bfloat16) * 1e-6).astype(
            jnp.bfloat16)

    @jax.jit
    def pallas_step(x, layers):
        for lp in layers:
            q = pallas_matmul(x, lp["wq"])
            kv = pallas_matmul(x, lp["wkv"])
            o = pallas_matmul(q.astype(jnp.bfloat16), lp["wo"])
            h13 = pallas_matmul(x, lp["w13"])
            g, u = jnp.split(h13, 2, axis=-1)
            x = (o + pallas_matmul((jax.nn.silu(g) * u
                                    ).astype(jnp.bfloat16), lp["w2"])
                 + kv.sum(-1, keepdims=True) * 0).astype(jnp.bfloat16)
        return x

    x0 = mk((B, DIM))
    for name, fn in [("XLA matmul stack", xla_step),
                     ("Pallas pure stream", stream_step),
                     ("Pallas matmul stack", pallas_step)]:
        try:
            ms = time_carried(fn, x0, layers)
            log(f"{name:22s}: {ms:7.2f} ms  ({nbytes / ms / 1e6:.0f} GB/s)")
        except Exception as e:
            log(f"{name:22s}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
