#!/usr/bin/env python3
"""Does merging the bf16 decode matmuls lift the weight-stream bandwidth?

Round 3 measured the SPLIT bf16 26-layer stack at 633 GB/s (9.55 ms over
6.05 GB, tools/profile_bf16_matmul.py) and rejected merged QKV/w1w3 for
Q8 (~3%, invasive). The bf16 125-audio-s/s campaign needs the per-token
weight read cheaper: this probe measures, with the same loop-carried
methodology,

  split stack     wq|wk|wv, w1|w3 separate (the shipped layout)
  merged stack    wqkv [D, Qd+2Kd], w13 [D, 2H] (outputs sliced after)
  mega stack      wqkv‖w13 fused further: one [D, Qd+2Kd+2H] dot
  width sweep     [B, D] @ [D, N] for N in {1024..18432}: the
                  bandwidth-vs-output-width curve that explains the gap

A merged dot is EXACT vs the split dots (each output column is the same
reduction; slicing after is a no-op on values), so any win is free.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("VOX_PROF_STREAMS", "26"))
L = 26
DIM, QD, KD, HID = 3072, 4096, 1024, 9216


def log(m):
    print(m, file=sys.stderr, flush=True)


_key = [jax.random.PRNGKey(0)]


def mk(shape):
    _key[0], k = jax.random.split(_key[0])
    return (jax.random.uniform(k, shape, jnp.float32) - 0.5
            ).astype(jnp.bfloat16) * 0.05


def time_loop(f, x, *args, iters=20):
    x = f(x, *args)
    np.asarray(jax.device_get(x.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x, *args)       # loop-carried
    np.asarray(jax.device_get(x.ravel()[:1]))
    return (time.perf_counter() - t0) / iters * 1e3


@jax.jit
def split_fn(x, layers):
    for lp in layers:
        q = x @ lp["wq"]
        k = x @ lp["wk"]
        v = x @ lp["wv"]
        o = q @ lp["wo"]
        h = (x @ lp["w1"]) * (x @ lp["w3"])
        x = (x + o + h @ lp["w2"]
             + k.sum(-1, keepdims=True) * 0
             + v.sum(-1, keepdims=True) * 0).astype(jnp.bfloat16)
    return x


@jax.jit
def merged_fn(x, layers):
    for lp in layers:
        qkv = x @ lp["wqkv"]
        q = qkv[:, :QD]
        k = qkv[:, QD:QD + KD]
        v = qkv[:, QD + KD:]
        o = q @ lp["wo"]
        g = x @ lp["w13"]
        h = g[:, :HID] * g[:, HID:]
        x = (x + o + h @ lp["w2"]
             + k.sum(-1, keepdims=True) * 0
             + v.sum(-1, keepdims=True) * 0).astype(jnp.bfloat16)
    return x


@jax.jit
def mega_fn(x, layers):
    for lp in layers:
        big = x @ lp["wbig"]            # [B, QD+2KD+2HID]
        q = big[:, :QD]
        k = big[:, QD:QD + KD]
        v = big[:, QD + KD:QD + 2 * KD]
        g = big[:, QD + 2 * KD:]
        o = q @ lp["wo"]
        h = g[:, :HID] * g[:, HID:]
        x = (x + o + h @ lp["w2"]
             + k.sum(-1, keepdims=True) * 0
             + v.sum(-1, keepdims=True) * 0).astype(jnp.bfloat16)
    return x


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}; B={B}")
    x = mk((B, DIM))
    per_layer = (DIM * QD + 2 * DIM * KD + QD * DIM + 2 * DIM * HID
                 + HID * DIM) * 2
    nbytes = L * per_layer

    split = tuple(
        {"wq": mk((DIM, QD)), "wk": mk((DIM, KD)), "wv": mk((DIM, KD)),
         "wo": mk((QD, DIM)), "w1": mk((DIM, HID)), "w3": mk((DIM, HID)),
         "w2": mk((HID, DIM))}
        for _ in range(L))
    ms = time_loop(split_fn, x, split)
    log(f"split stack : {ms:7.2f} ms  ({nbytes / ms / 1e6:.0f} GB/s "
        f"over {nbytes / 1e9:.2f} GB)")

    merged = tuple(
        {"wqkv": jnp.concatenate([lp["wq"], lp["wk"], lp["wv"]], axis=1),
         "wo": lp["wo"],
         "w13": jnp.concatenate([lp["w1"], lp["w3"]], axis=1),
         "w2": lp["w2"]}
        for lp in split)
    jax.block_until_ready(merged)
    ms = time_loop(merged_fn, x, merged)
    log(f"merged stack: {ms:7.2f} ms  ({nbytes / ms / 1e6:.0f} GB/s)")

    mega = tuple(
        {"wbig": jnp.concatenate([lp["wqkv"], lp["w13"]], axis=1),
         "wo": lp["wo"], "w2": lp["w2"]}
        for lp in merged)
    del merged
    jax.block_until_ready(mega)
    ms = time_loop(mega_fn, x, mega)
    log(f"mega stack  : {ms:7.2f} ms  ({nbytes / ms / 1e6:.0f} GB/s)")
    del mega, split

    log("width sweep [B, 3072] @ [3072, N] (xN chain to ~2 GB):")
    for n in (1024, 2048, 4096, 6144, 9216, 12288, 18432):
        reps = max(1, int(2e9 / (DIM * n * 2)))
        ws = tuple(mk((DIM, n)) for _ in range(reps))
        wb = tuple(mk((n, DIM)) for _ in range(reps))

        @jax.jit
        def chain(x, ws, wb):
            for w, b in zip(ws, wb):
                x = ((x @ w) @ b + x).astype(jnp.bfloat16)
            return x

        bts = sum(w.size * 2 for w in ws) + sum(w.size * 2 for w in wb)
        ms = time_loop(chain, x, ws, wb, iters=10)
        log(f"  N={n:6d} x{reps:3d}: {ms:7.2f} ms  "
            f"({bts / ms / 1e6:.0f} GB/s over {bts / 1e9:.2f} GB)")
        del ws, wb


if __name__ == "__main__":
    main()
