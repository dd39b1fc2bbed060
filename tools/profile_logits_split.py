#!/usr/bin/env python3
"""Logits pattern probe: is the ~410 GB/s 'floor' a property of the
pattern, or of the single 805 MB weight array?

Round 3 measured every logits variant (XLA [V,D] / [D,V], fused Pallas
per-block matmul+argmax) within a few % of ~410 GB/s and called it the
platform floor (SPEED.md bf16 campaign). All of those read ONE huge
array. The 26-layer decode stack reads many ~19-57 MB arrays at 657 GB/s
— this probe asks whether splitting the tied embedding into P separate
column-chunk arrays (exact: every logit is the same reduction; the
argmax combines per-part (max, idx) pairs) recovers the stack's rate.

Exactness of the combine: global argmax = argmax over parts of
(part_max, first part / first index wins ties) — matches jnp.argmax's
lowest-index tie-break as long as parts are scanned in order.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("VOX_PROF_STREAMS", "26"))
DIM, VOCAB = 3072, 131072


def log(m):
    print(m, file=sys.stderr, flush=True)


_key = [jax.random.PRNGKey(0)]


def mk(shape):
    _key[0], k = jax.random.split(_key[0])
    return (jax.random.uniform(k, shape, jnp.float32) - 0.5
            ).astype(jnp.bfloat16) * 0.05


def time_loop(f, x, *args, iters=30):
    x = f(x, *args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x, *args)       # loop-carried
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))
    return (time.perf_counter() - t0) / iters * 1e3


def fold_tok(x, tok):
    return (x + 1e-6 * tok[:, None].astype(jnp.bfloat16)).astype(jnp.bfloat16)


@jax.jit
def whole_vd(x, emb):       # emb [V, D] (storage layout), logits = x @ emb.T
    lg = jax.lax.dot_general(x, emb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return fold_tok(x, jnp.argmax(lg, axis=-1))


@jax.jit
def whole_dv(x, emb_t):     # emb_t [D, V]
    lg = jax.lax.dot_general(x, emb_t, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return fold_tok(x, jnp.argmax(lg, axis=-1))


def split_fn(nparts):
    w = VOCAB // nparts

    @jax.jit
    def f(x, parts):
        best_v = None
        best_i = None
        for p, wp in enumerate(parts):    # wp [D, w]
            lg = jax.lax.dot_general(x, wp, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            v = jnp.max(lg, axis=-1)
            i = jnp.argmax(lg, axis=-1).astype(jnp.int32) + p * w
            if best_v is None:
                best_v, best_i = v, i
            else:
                take = v > best_v        # strict >: first part wins ties
                best_v = jnp.where(take, v, best_v)
                best_i = jnp.where(take, i, best_i)
        return fold_tok(x, best_i)
    return f


def main():
    log(f"device: {jax.devices()[0]}; B={B}")
    x = mk((B, DIM))
    nbytes = VOCAB * DIM * 2

    emb = mk((VOCAB, DIM))
    ms = time_loop(whole_vd, x, emb)
    log(f"whole [V,D] contract-dim dot: {ms:6.2f} ms "
        f"({nbytes / ms / 1e6:.0f} GB/s)")
    emb_t = jnp.copy(emb.T)
    del emb
    ms = time_loop(whole_dv, x, emb_t)
    log(f"whole [D,V] plain dot       : {ms:6.2f} ms "
        f"({nbytes / ms / 1e6:.0f} GB/s)")

    for nparts in (4, 8, 16, 32):
        w = VOCAB // nparts
        parts = tuple(jnp.copy(emb_t[:, i * w:(i + 1) * w])
                      for i in range(nparts))
        jax.block_until_ready(parts)
        ms = time_loop(split_fn(nparts), x, parts)
        log(f"split x{nparts:2d} [D,{w}] arrays     : {ms:6.2f} ms "
            f"({nbytes / ms / 1e6:.0f} GB/s)")
        del parts

    # correctness: split argmax == whole argmax (incl. tie-break)
    emb_t = mk((DIM, 4096))
    parts = tuple(jnp.copy(emb_t[:, i * 512:(i + 1) * 512])
                  for i in range(8))
    lg = np.asarray(jax.lax.dot_general(x, emb_t, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32))
    want = lg.argmax(-1)

    @jax.jit
    def split_ids(x, parts):
        best_v = best_i = None
        for p, wp in enumerate(parts):
            l = jax.lax.dot_general(x, wp, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            v, i = jnp.max(l, -1), jnp.argmax(l, -1).astype(jnp.int32) + p * 512
            if best_v is None:
                best_v, best_i = v, i
            else:
                take = v > best_v
                best_v, best_i = jnp.where(take, v, best_v), jnp.where(take, i, best_i)
        return best_i
    got = np.asarray(split_ids(x, parts))
    log(f"argmax parity vs whole: {(got == want).sum()}/{B}")


if __name__ == "__main__":
    main()
