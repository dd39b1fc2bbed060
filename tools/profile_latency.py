#!/usr/bin/env python3
"""B=1 serving-path token-latency breakdown (BASELINE.md:39-40; VERDICT
round-2 weak #3: p50 141 ms at the API surface vs ~72 ms raw step — where
do the extra ~70 ms go?).

Splits one FleetManager feed->token round into phases, each synced for
attribution (upload: block_until_ready; downloads: np.asarray). Phases
match the PACKED wire (one upload, one download per step — each extra
transfer costs ~25 ms of fixed link latency on this tunnel):

  stage+wire_up  cut the chunk + pack_wire (pcm‖active‖forced) + the ONE
                 host->device upload
  step+aux_down  fleet_step_masked dispatch + device step + the ONE packed
                 aux download (tokens + best + top-k vals/idx), including
                 the sub-ms host-side bit-pattern column unpack
  host_walk      _consume: classification, alt cutoff walk, queue append

Watchdog restarts queued by _consume are applied at the top of each
iteration (mirroring poll's _apply_resets) and those recovery iterations
are EXCLUDED from the phase averages — the breakdown characterizes the
steady single-step pipeline; the burst cost is measured separately by
tools/profile_latency_trace.py.

Then measures UNSYNCED feed+poll p50/p95 for config variants: alt on/off,
chunk_tokens 6/2, wire f32/s16 — the "latency mode" tradeoff table.

Usage: VOX_PROF_KV=int8 python tools/profile_latency.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.quant import quantize_params
from voxtral_tpu.runtime.fleet import fleet_step_masked
from voxtral_tpu.runtime.manager import FleetManager
from voxtral_tpu.weights import random_params_device

KV = os.environ.get("VOX_PROF_KV", "int8")
ITERS = int(os.environ.get("VOX_PROF_ITERS", "40"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def pc():
    return time.perf_counter()


def make_mgr(params, cfg, chunk_tokens, n_alt, wire="f32"):
    mgr = FleetManager(params, cfg, batch=1, chunk_tokens=chunk_tokens,
                       dec_ring=2048, kv_dtype=KV, continuous=True,
                       n_alt=n_alt, alt_cutoff=0.95, wire_dtype=wire)
    mgr.attach()
    return mgr


def feed_poll(mgr, rng):
    pcm = ((rng.rand(mgr.chunk_samp) - 0.5) * 0.2).astype(np.float32)
    t0 = pc()
    mgr.feed(0, pcm)
    mgr.poll()
    return (pc() - t0) * 1e3


def breakdown(mgr, rng, iters=ITERS):
    """Synced per-phase timing of the poll() pipeline at B=1 (packed wire:
    one upload, one download per step — mirrors FleetManager.poll)."""
    acc = {}
    cur = {}

    def mark(key, t0):
        cur[key] = cur.get(key, 0.0) + (pc() - t0) * 1e3

    topk = mgr.n_alt - 1 if mgr.n_alt > 1 else 0
    k = topk
    measured = 0
    for _ in range(iters):
        pcm = ((rng.rand(mgr.chunk_samp) - 0.5) * 0.2).astype(np.float32)
        mgr.feed(0, pcm)

        # apply queued watchdog/attach resets (as poll() does) and skip
        # the recovery feed's phases: its multi-step burst would smear the
        # steady-pipeline attribution (ADVICE r3)
        recovery = bool(mgr._pending_resets)
        mgr._apply_resets()
        cur = {}

        t0 = pc()
        staged = mgr._stage({})
        jax.block_until_ready(staged.pcm_dev)
        mark("stage+wire_up", t0)

        t0 = pc()
        mgr.state, tokens, aux = fleet_step_masked(
            mgr.params, mgr.cfg, mgr.state, staged.pcm_dev, None, None,
            mgr.t_ada, collect_topk=topk, stop_at_eos=not mgr.continuous,
            wire_packed=True)
        alts = None
        if topk:
            pk = np.asarray(aux["packed"])
            tokens = np.ascontiguousarray(pk[:, :, 0]).view(np.int32)
            alts = (pk[:, :, 2:2 + k],
                    np.ascontiguousarray(pk[:, :, 2 + k:2 + 2 * k])
                    .view(np.int32),
                    pk[:, :, 1])
        else:
            tokens = np.asarray(tokens)
        mark("step+aux_down", t0)

        t0 = pc()
        mgr.steps += 1
        for sid in staged.part:
            mgr._consume(sid, tokens[sid], staged.forced[sid],
                         None if alts is None else
                         (alts[0][sid], alts[1][sid], alts[2][sid]))
        mark("host_walk", t0)
        if not recovery:
            measured += 1
            for k2, v in cur.items():
                acc[k2] = acc.get(k2, 0.0) + v
    return {k2: v / max(measured, 1) for k2, v in acc.items()}


def main(params=None, cfg=None):
    """params: pre-built Q8 param tree (e.g. from a combo runner that
    already paid the ~16 min device init on this tunnel); built here if
    absent."""
    log(f"device: {jax.devices()[0]}; kv={KV}")
    if cfg is None:
        cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    if params is None:
        t0 = pc()
        params = quantize_params(random_params_device(cfg, seed=0))
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
        log(f"Q8 params ready in {pc() - t0:.1f}s")

    rng = np.random.RandomState(1)

    # --- phase breakdown at the bench config (chunk 6, alt on) ---
    mgr = make_mgr(params, cfg, 6, 2)
    for _ in range(12):
        feed_poll(mgr, rng)          # compile + warm
    parts = breakdown(mgr, rng)
    total = sum(parts.values())
    log(f"phase breakdown (B=1, 0.48 s feeds, alt top-k on, synced):")
    for k, v in parts.items():
        log(f"  {k:14s} {v:7.2f} ms  ({v / total * 100:4.1f}%)")
    log(f"  {'sum':14s} {total:7.2f} ms")
    del mgr

    # --- config variants, unsynced end-to-end p50/p95 ---
    for name, ct, n_alt, wire in [
        ("bench: chunk6 alt-on f32", 6, 2, "f32"),
        ("alt OFF", 6, 1, "f32"),
        ("chunk2 (0.16s feeds) alt-on", 2, 2, "f32"),
        ("chunk2 alt OFF", 2, 1, "f32"),
        ("s16 wire, chunk6 alt-on", 6, 2, "s16"),
    ]:
        mgr = make_mgr(params, cfg, ct, n_alt, wire)
        for _ in range(12):
            feed_poll(mgr, rng)
        xs = sorted(feed_poll(mgr, rng) for _ in range(ITERS))
        log(f"{name:30s} p50 {xs[len(xs) // 2]:7.1f} ms | "
            f"p95 {xs[int(len(xs) * 0.95)]:7.1f} ms per {ct * 0.08:.2f}s feed")
        del mgr


if __name__ == "__main__":
    main()
