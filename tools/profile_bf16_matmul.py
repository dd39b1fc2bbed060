#!/usr/bin/env python3
"""bf16 decode-matmul roofline probe: the 26-layer weight-read stack at
M=B activations, bf16 weights vs Q8 — is XLA's bf16 dot reaching the same
effective HBM bandwidth as the Q8 mixed dot (~576 GB/s), or is the bf16
fleet step losing to a lower weight-read rate?

Loop-carried timing (SPEED.md methodology: loop-invariant scans overlap
dispatches and lie)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.ops.linear import linear
from voxtral_tpu.quant import Quantized

B = int(os.environ.get("VOX_PROF_STREAMS", "24"))
L = 26
DIM, QD, KD, HID, VOCAB = 3072, 4096, 1024, 9216, 131072
rng = np.random.RandomState(0)


def log(m):
    print(m, file=sys.stderr, flush=True)


_key = [jax.random.PRNGKey(0)]


def _next_key():
    _key[0], k = jax.random.split(_key[0])
    return k


def mk(shape, dt=jnp.bfloat16):
    # generated ON DEVICE: uploading GBs over the tunnel dominates otherwise
    return (jax.random.uniform(_next_key(), shape, jnp.float32) - 0.5
            ).astype(dt) * 0.05


def mkq(shape):
    return Quantized(
        q=jax.random.randint(_next_key(), shape, -127, 127, jnp.int32
                             ).astype(jnp.int8),
        s=jnp.full((shape[1],), 0.01, jnp.float32))


def layer_weights(q8: bool):
    w = mkq if q8 else mk
    return tuple(
        {"wq": w((DIM, QD)), "wk": w((DIM, KD)), "wv": w((DIM, KD)),
         "wo": w((QD, DIM)), "w1": w((DIM, HID)), "w3": w((DIM, HID)),
         "w2": w((HID, DIM))}
        for _ in range(L))


@jax.jit
def stack_fn(x, layers):
    # layers passed as a jit ARGUMENT — closing over device arrays bakes
    # 6 GB of constants into the HLO
    for lp in layers:
        q = linear(x, lp["wq"])
        k = linear(x, lp["wk"])
        v = linear(x, lp["wv"])
        o = linear(q, lp["wo"])
        h = linear(x, lp["w1"]) * linear(x, lp["w3"])
        x = (x + o + linear(h, lp["w2"])
             + k.sum(-1, keepdims=True) * 0
             + v.sum(-1, keepdims=True) * 0).astype(jnp.bfloat16)
    return x


def time_loop(f, x, *args, iters=20):
    x = f(x, *args)
    np.asarray(jax.device_get(x.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x, *args)       # loop-carried
    np.asarray(jax.device_get(x.ravel()[:1]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform}); B={B}")
    x = mk((B, DIM))

    per_layer = DIM * QD + 2 * DIM * KD + QD * DIM + 2 * DIM * HID + HID * DIM
    # Q8 also reads one f32 scale per output column of each matmul
    per_layer_scales = 4 * (QD + 2 * KD + 2 * HID + 2 * DIM)
    for q8 in (False, True):
        layers = layer_weights(q8)
        nbytes = L * (per_layer + per_layer_scales if q8 else per_layer * 2)
        ms = time_loop(stack_fn, x, layers)
        log(f"{'Q8  ' if q8 else 'bf16'} 26-layer matmul stack: "
            f"{ms:7.2f} ms  ({nbytes / ms / 1e6:.0f} GB/s over "
            f"{nbytes / 1e9:.2f} GB)")
        del layers

    @jax.jit
    def flog(x, emb):
        from voxtral_tpu.ops.linear import embed_logits
        lg = embed_logits(x, emb)
        t = jnp.argmax(lg, axis=-1)
        return (x + 1e-6 * t[:, None].astype(jnp.bfloat16)).astype(
            jnp.bfloat16)

    # tied-embedding logits read (the other big per-token weight read)
    for q8 in (False, True):
        emb = (Quantized(
                   q=jax.random.randint(_next_key(), (VOCAB, DIM), -127, 127,
                                        jnp.int32).astype(jnp.int8),
                   s=jnp.full((VOCAB,), 0.01, jnp.float32), axis=0)
               if q8 else mk((VOCAB, DIM)))
        nbytes = VOCAB * DIM + VOCAB * 4 if q8 else VOCAB * DIM * 2
        ms = time_loop(flog, x, emb)
        log(f"{'Q8  ' if q8 else 'bf16'} logits+argmax [B,{VOCAB}]: "
            f"{ms:7.2f} ms  ({nbytes / ms / 1e6:.0f} GB/s)")
        del emb


if __name__ == "__main__":
    main()
