#!/usr/bin/env python3
"""Can the TPU overlap an MXU-bound subgraph with an HBM-bound one?

The round-3 bf16 ceiling proof assumed the fleet step's phases run
SERIALLY (SPEED.md "Ceiling proof"); VERDICT r3 (Weak #1 / Next #1)
attacks exactly that assumption: the ~67 ms encoder section is MXU-bound
(90% MXU, low HBM demand) while the ~287 ms decode scan is HBM-bound
(MXU mostly idle) — if the scheduler can interleave them, a one-chunk
software pipeline (decode chunk k-1 while encoding chunk k) clears the
125 audio-s/s bf16 target on round 3's own component numbers.

This probe measures the PRIMITIVE question on toy subgraphs shaped like
the real phases, before any fleet refactor:

  A (decode-like):  chain of N_A dots [B_dec, D] @ [D, D] — tiny row
                    count, weight-streaming, DMA-bound (~26 rows like
                    the B=26 fleet decode).
  B (encoder-like): chain of N_B dots [M, De] @ [De, De] — M ~ 2080 rows
                    (B*S at the fleet encoder chunk), MXU-bound.

Timings (each loop-carried across calls, np.asarray sync per call):
  t(A), t(B)            each alone in its own jit
  t(A ; B) serial       one jit, B's input depends on A's output
  t(A , B) independent  one jit, data-independent subgraphs
  t(A , B) interleaved  same, but ops interleaved at trace time
  t(scanA , B)          A as a lax.scan over stacked weights, B flat —
                        does the while-loop barrier block overlap?
  t(copy , B)           big HBM DUS copy (ring-fold-like) vs B

Overlap exists iff t(A , B) << t(A) + t(B) (floor: max(t_A, t_B)).

Usage: python tools/profile_overlap.py  [VOX_PROF_* env overrides]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B_DEC = int(os.environ.get("VOX_PROF_BDEC", "26"))
D_DEC = int(os.environ.get("VOX_PROF_DDEC", "8192"))
N_A = int(os.environ.get("VOX_PROF_NA", "16"))
M_ENC = int(os.environ.get("VOX_PROF_MENC", "2048"))
D_ENC = int(os.environ.get("VOX_PROF_DENC", "2560"))
N_B = int(os.environ.get("VOX_PROF_NB", "32"))
R_A = int(os.environ.get("VOX_PROF_RA", "8"))   # in-program chain repeats:
R_B = int(os.environ.get("VOX_PROF_RB", "6"))   # work >> ~25 ms link cost
ITERS = int(os.environ.get("VOX_PROF_ITERS", "10"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def a_chain(ws_a, xa):
    for _ in range(R_A):
        for w in ws_a:
            xa = jnp.tanh(xa @ w)
    return xa


def b_chain(ws_b, xb):
    for _ in range(R_B):
        for w in ws_b:
            xb = jnp.tanh(xb @ w)
    return xb


@jax.jit
def f_a(ws_a, xa):
    return a_chain(ws_a, xa)


@jax.jit
def f_b(ws_b, xb):
    return b_chain(ws_b, xb)


@jax.jit
def f_serial(ws_a, ws_b, xa, xb):
    ya = a_chain(ws_a, xa)
    # forced dependency: B's input perturbed by A's output (scalar)
    yb = b_chain(ws_b, xb + ya.sum() * 1e-9)
    return ya, yb


@jax.jit
def f_indep(ws_a, ws_b, xa, xb):
    return a_chain(ws_a, xa), b_chain(ws_b, xb)


@jax.jit
def f_interleaved(ws_a, ws_b, xa, xb):
    """Same math as f_indep, ops interleaved at trace time (hint to the
    scheduler's list order)."""
    seq_a = [w for _ in range(R_A) for w in ws_a]
    seq_b = [w for _ in range(R_B) for w in ws_b]
    k = max(1, len(seq_b) // len(seq_a))
    j = 0
    for wa in seq_a:
        xa = jnp.tanh(xa @ wa)
        for wb in seq_b[j:j + k]:
            xb = jnp.tanh(xb @ wb)
        j += k
    for wb in seq_b[j:]:
        xb = jnp.tanh(xb @ wb)
    return xa, xb


@jax.jit
def f_scan_indep(ws_a_stack, ws_b, xa, xb):
    """A as lax.scan over stacked weights (the real decode is a scan):
    does the while-loop barrier stop B from overlapping?"""
    def body(c, w):
        return jnp.tanh(c @ w), ()
    ya = xa
    for _ in range(R_A):
        ya, _ = jax.lax.scan(body, ya, ws_a_stack)
    return ya, b_chain(ws_b, xb)


@jax.jit
def f_copy_indep(big_src, big_dst, ws_b, xb):
    dst = jax.lax.dynamic_update_slice(big_dst, big_src, (0, 0))
    return dst, b_chain(ws_b, xb)


def timeit(name, fn, *args, carry=(), iters=ITERS):
    """carry: indices of args that are loop-CARRIED from the matching
    outputs (CLAUDE.md: loop-invariant timing lets the scheduler overlap
    dispatches and lies). Outputs are fully synced every iteration via a
    host transfer (np.asarray of each leaf's first element)."""
    args = list(args)

    def sync(out):
        # ONE tiny fetch: a program's outputs all materialize when it
        # finishes, so waiting on one leaf waits on the whole call (and
        # the loop-carry serializes successive calls regardless)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
        return out

    out = sync(fn(*args))
    outs = out if isinstance(out, tuple) else (out,)
    for oi, ai in carry:
        args[ai] = outs[oi]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        outs = out if isinstance(out, tuple) else (out,)
        for oi, ai in carry:
            args[ai] = outs[oi]
        sync(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    log(f"  {name:28s} {dt:8.2f} ms")
    return dt


def main():
    log(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, N_A + N_B + 4)
    dt = jnp.bfloat16
    ws_a = tuple(jax.random.normal(ks[i], (D_DEC, D_DEC), dt) * 0.02
                 for i in range(N_A))
    ws_b = tuple(jax.random.normal(ks[N_A + i], (D_ENC, D_ENC), dt) * 0.02
                 for i in range(N_B))
    xa = jax.random.normal(ks[-1], (B_DEC, D_DEC), dt)
    xb = jax.random.normal(ks[-2], (M_ENC, D_ENC), dt)
    ws_a_stack = jnp.stack(ws_a)
    big_src = jax.random.normal(ks[-3], (8192, 8192), dt)   # 128 MB copy
    big_dst = jnp.zeros((8200, 8192), dt)

    a_bytes = R_A * N_A * D_DEC * D_DEC * 2 / 1e9
    b_flops = 2 * R_B * N_B * M_ENC * D_ENC * D_ENC / 1e12
    log(f"A: {R_A}x{N_A} x [{B_DEC},{D_DEC}]@[{D_DEC},{D_DEC}] "
        f"({a_bytes:.2f} GB weight reads, DMA-bound)")
    log(f"B: {R_B}x{N_B} x [{M_ENC},{D_ENC}]@[{D_ENC},{D_ENC}] "
        f"({b_flops:.2f} TFLOP, MXU-bound)")

    jax.block_until_ready((ws_a, ws_b, xa, xb, ws_a_stack, big_src, big_dst))

    t_a = timeit("A alone", f_a, ws_a, xa, carry=((0, 1),))
    t_b = timeit("B alone", f_b, ws_b, xb, carry=((0, 1),))
    log(f"  {'— serial floor A+B':28s} {t_a + t_b:8.2f} ms")
    log(f"  {'— overlap floor max(A,B)':28s} {max(t_a, t_b):8.2f} ms")
    t_ser = timeit("A;B forced-serial", f_serial, ws_a, ws_b, xa, xb,
                   carry=((0, 2), (1, 3)))
    t_ind = timeit("A,B independent", f_indep, ws_a, ws_b, xa, xb,
                   carry=((0, 2), (1, 3)))
    t_int = timeit("A,B interleaved trace", f_interleaved, ws_a, ws_b, xa, xb,
                   carry=((0, 2), (1, 3)))
    t_scn = timeit("scan(A),B independent", f_scan_indep, ws_a_stack, ws_b,
                   xa, xb, carry=((0, 2), (1, 3)))
    t_cpy = timeit("copy(128MB),B indep", f_copy_indep, big_src, big_dst,
                   ws_b, xb, carry=((1, 3),))
    timeit("copy alone", jax.jit(
        lambda s, d: jax.lax.dynamic_update_slice(d, s, (0, 0))),
        big_src, big_dst)

    ov = (t_a + t_b - t_ind) / min(t_a, t_b) * 100
    log(f"overlap recovered (independent): {ov:.0f}% of min(A,B)")


if __name__ == "__main__":
    main()
