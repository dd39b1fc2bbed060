#!/usr/bin/env python3
"""Greedy-logits probe: the per-token [B, 131072] tied-embedding logits +
argmax read runs well below the HBM floor (measured 209 GB/s Q8 / 350 GB/s
bf16 vs ~550-650 GB/s the layer matmuls reach — profile_bf16_matmul.py).
Variants:
  1. current XLA path (embed_logits + jnp.argmax)
  2. transposed table [D, V] XLA dot
  3. fused Pallas kernel: per-vocab-block matmul + running argmax in VMEM
     (the [B, V] f32 logits never hit HBM)

Loop-carried timing. Every variant's tokens are checked against variant 1.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.ops.linear import embed_logits
from voxtral_tpu.quant import Quantized

B = int(os.environ.get("VOX_PROF_STREAMS", "24"))
DIM, VOCAB = 3072, 131072
BLKS = [int(x) for x in os.environ.get("VOX_PROF_BLKS", "512,1024,2048").split(",")]


def log(m):
    print(m, file=sys.stderr, flush=True)


_key = [jax.random.PRNGKey(0)]


def _next_key():
    _key[0], k = jax.random.split(_key[0])
    return k


def time_carried(step, h0, *args, iters=30):
    """step(h, *args) -> (h', tok); h loop-carried so dispatches can't
    overlap. Tables ride as explicit jit args — closing over device arrays
    bakes GB-sized constants into the HLO (see profile_bf16_matmul.py)."""
    h, tok = step(h0, *args)
    np.asarray(jax.device_get(tok.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        h, tok = step(h, *args)
    np.asarray(jax.device_get(tok.ravel()[:1]))
    return (time.perf_counter() - t0) / iters * 1e3


def fused_logits_argmax(h, emb_q, emb_s, blk):
    """h [B, D] bf16; emb_q [V, D] int8|bf16; emb_s [1, V] f32 or None.
    Returns tok [B] int32 == argmax(embed_logits(h, emb)) with first-max
    tie semantics (sequential blocks, strict > merge)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, D = emb_q.shape
    assert V % blk == 0, f"blk {blk} must divide vocab {V}"
    nb = V // blk

    def kernel(h_ref, t_ref, s_ref, val_ref, tok_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            val_ref[:] = jnp.full_like(val_ref, -jnp.inf)
            tok_ref[:] = jnp.zeros_like(tok_ref)

        hv = h_ref[:]                                    # [B, D]
        tb = t_ref[:]                                    # [blk, D]
        sc = jax.lax.dot_general(
            hv, tb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [B, blk]
        if s_ref is not None:
            sc = sc * s_ref[:]                           # [1, blk] bcast
        mv = jnp.max(sc, axis=1)                         # [B]
        ai = jnp.argmax(sc, axis=1).astype(jnp.int32) + i * blk
        cur = val_ref[:, 0]
        better = mv > cur
        val_ref[:, 0] = jnp.where(better, mv, cur)
        tok_ref[:, 0] = jnp.where(better, ai, tok_ref[:, 0])

    in_specs = [
        pl.BlockSpec((h.shape[0], D), lambda i: (0, 0)),
        pl.BlockSpec((blk, D), lambda i: (i, 0)),
    ]
    args = [h, emb_q]
    if emb_s is not None:
        in_specs.append(pl.BlockSpec((1, blk), lambda i: (0, i)))
        args.append(emb_s)
        kfn = kernel
    else:
        def kfn(h_ref, t_ref, val_ref, tok_ref):
            return kernel(h_ref, t_ref, None, val_ref, tok_ref)

    val, tok = pl.pallas_call(
        kfn,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((h.shape[0], 128), lambda i: (0, 0)),
            pl.BlockSpec((h.shape[0], 128), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h.shape[0], 128), jnp.float32),
            jax.ShapeDtypeStruct((h.shape[0], 128), jnp.int32),
        ],
    )(*args)
    return tok[:, 0]


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform}); B={B}")
    h0 = (jax.random.uniform(_next_key(), (B, DIM), jnp.float32) - 0.5
          ).astype(jnp.bfloat16)

    for q8 in (False, True):
        name = "Q8  " if q8 else "bf16"
        if q8:
            embq = jax.random.randint(_next_key(), (VOCAB, DIM), -127, 127,
                                      jnp.int32).astype(jnp.int8)
            embs = (jax.random.uniform(_next_key(), (VOCAB,), jnp.float32)
                    * 0.02 + 0.001)
            emb = Quantized(q=embq, s=embs, axis=0)
            nbytes = VOCAB * DIM + VOCAB * 4   # int8 table + f32 scales
        else:
            embq = (jax.random.uniform(_next_key(), (VOCAB, DIM), jnp.float32)
                    - 0.5).astype(jnp.bfloat16) * 0.05
            embs = None
            emb = embq
            nbytes = VOCAB * DIM * 2

        @jax.jit
        def base_step(h, emb):
            lg = embed_logits(h, emb)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return (h + 1e-6 * tok[:, None].astype(jnp.bfloat16)
                    ).astype(jnp.bfloat16), tok

        ms = time_carried(base_step, h0, emb)
        _, ref_tok = base_step(h0, emb)
        ref_tok = np.asarray(ref_tok)
        log(f"{name} XLA logits+argmax      : {ms:6.2f} ms "
            f"({nbytes / ms / 1e6:.0f} GB/s)")

        # transposed table
        embt = embq.T if not q8 else Quantized(q=embq.T, s=embs, axis=-1)

        @jax.jit
        def t_step(h, embt):
            if q8:
                lg = jax.lax.dot_general(
                    h, embt.q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * embt.s
            else:
                lg = jax.lax.dot_general(
                    h, embt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return (h + 1e-6 * tok[:, None].astype(jnp.bfloat16)
                    ).astype(jnp.bfloat16), tok

        ms = time_carried(t_step, h0, embt)
        _, tt = t_step(h0, embt)
        ok = "OK" if np.array_equal(np.asarray(tt), ref_tok) else "MISMATCH"
        log(f"{name} XLA transposed [D,V]   : {ms:6.2f} ms "
            f"({nbytes / ms / 1e6:.0f} GB/s) tokens {ok}")

        s2d = None if embs is None else embs.reshape(1, VOCAB)
        for blk in BLKS:
            @functools.partial(jax.jit, static_argnums=(3,))
            def p_step(h, embq, s2d, blk):
                tok = fused_logits_argmax(h, embq, s2d, blk)
                return (h + 1e-6 * tok[:, None].astype(jnp.bfloat16)
                        ).astype(jnp.bfloat16), tok

            try:
                ms = time_carried(p_step, h0, embq, s2d, blk)
                _, pt = p_step(h0, embq, s2d, blk)
                ok = ("OK" if np.array_equal(np.asarray(pt), ref_tok)
                      else "MISMATCH")
            except Exception as e:  # noqa: BLE001
                log(f"{name} Pallas fused blk={blk:5d}: FAILED {type(e).__name__}: {str(e)[:120]}")
                continue
            log(f"{name} Pallas fused blk={blk:5d}: {ms:6.2f} ms "
                f"({nbytes / ms / 1e6:.0f} GB/s) tokens {ok}")
        del embq, emb, embt
    log("floor: int8 table 0.40 GB, bf16 0.81 GB; layer-matmul rates "
        "~550-650 GB/s => ~0.7 / ~1.3 ms")


if __name__ == "__main__":
    main()
