#!/usr/bin/env python3
"""Serving soak: sustained FleetManager operation under stream churn.

Production-serving evidence the step benchmarks can't give: a fleet at the
headline config (Q8 weights + int8 decoder KV + int4 encoder rings) run
for minutes of wall time while streams continuously END and are REPLACED —
finish() drain -> finished -> detach -> attach into the reused slot, with
the continuous-mode watchdogs live the whole time (random weights trigger
real eos/streak/kv restarts, exercising forced-replay + pushback under
churn). Reference analogue: the engine is designed to run "indefinitely"
on a live mic (reference README.md:96-130); this measures that regime at
fleet scale instead of one stream.

Reported (all measured):
  - sustained audio-s/s over the whole soak (closed loop: one chunk fed
    per active stream per iteration, polled to completion — fed == consumed)
  - per-poll wall-time p50/p95/max (token-delivery jitter under churn)
  - churn events (stream completions + replacements), watchdog restarts
  - HBM gauge at start / mid / end — flat means no state leak across
    slot reuse (the reference has no analogue; Metal buffers are static)

Scheduling notes (measured, 08-21 — the soak loop exposes two real
serving-caller effects, both documented so deployments avoid them):
  1. A device step costs the full B=40 compiled shape NO MATTER how few
     streams' chunks it carries — so any schedule that lets a finishing
     stream's pad chunks or a new stream's replay chunks drain in their
     own near-empty steps pays ~full step price for ~nothing. Measured:
     poll-to-completion after each 1-round feed = 57.2 audio-s/s (622
     steps for 273 rounds); cap=2 = 75.7; 4-round batch feeding = 86.5.
     The fix is TOP-UP feeding + cap=DEPTH polls: keep every stream's
     buffer at DEPTH chunks (feed only what the last poll consumed) and
     never run more steps than DEPTH per poll — churn overhead then
     rides INSIDE full-occupancy steps (its cost becomes its slot share,
     ~8%, instead of whole steps).
  2. poll()'s first step per call uploads its PCM synchronously; only
     steps AFTER the first overlap their upload with the running step
     (dispatch-then-stage). Depth-1 cycles therefore pay a sync upload
     every step; depth-D cycles amortize it over D steps — the same
     finding as tools/profile_manager.py (319.9 -> 242.4 ms/step at
     DEPTH=4). Throughput mode = top-up depth feeding (D x chunk_s added
     feed latency); latency mode = depth 1 + max_steps_per_poll=1
     (bench.py's serving section).

Env: VOX_SOAK_STREAMS=40 VOX_SOAK_SECONDS=300 VOX_SOAK_MIN_S=20
     VOX_SOAK_MAX_S=90 VOX_SOAK_KV=int8 VOX_SOAK_ENC_KV=int4
     VOX_SOAK_DEPTH=4 (top-up buffer depth, chunks per stream)
     VOX_SOAK_CAP=-1 (max device steps per poll; -1 = DEPTH, 0 = uncapped)
     VOX_SOAK_WIRE=f32 (s16 halves bytes but measured slower on this
                        tunnel — SPEED.md serving-path entry)
     VOX_SOAK_PIPE=2 (FleetManager pipeline_steps: 2 dispatches step k+1
                      before fetching step k's tokens, hiding the per-step
                      host sync — +2.5-3% measured; 1 = serial order)
     VOX_SOAK_ALT=0 (n_alt-1; >0 adds the packed top-k download)
     VOX_SOAK_PHASES=1: report the wall-time split (feed / device steps /
                        stage-entry uploads / resets / rest-of-poll)
     VOX_SOAK_TINY=1: tiny_config on CPU (mechanism smoke, not a number)
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
from voxtral_tpu.runtime.manager import FleetManager
from voxtral_tpu.utils import device_memory_gb
from voxtral_tpu.weights import random_params_device

TINY = os.environ.get("VOX_SOAK_TINY", "0") == "1"
B = int(os.environ.get("VOX_SOAK_STREAMS", "4" if TINY else "40"))
SECONDS = float(os.environ.get("VOX_SOAK_SECONDS", "20" if TINY else "300"))
MIN_S = float(os.environ.get("VOX_SOAK_MIN_S", "3" if TINY else "20"))
MAX_S = float(os.environ.get("VOX_SOAK_MAX_S", "8" if TINY else "90"))
KV = os.environ.get("VOX_SOAK_KV", "int8")
ENC_KV = os.environ.get("VOX_SOAK_ENC_KV", "int4") or None
DEPTH = int(os.environ.get("VOX_SOAK_DEPTH", "4"))
_cap = int(os.environ.get("VOX_SOAK_CAP", "-1"))
CAP = DEPTH if _cap < 0 else (_cap or None)
WIRE = os.environ.get("VOX_SOAK_WIRE", "f32")
PIPE = int(os.environ.get("VOX_SOAK_PIPE", "2"))
ALT = int(os.environ.get("VOX_SOAK_ALT", "0"))
PHASES = os.environ.get("VOX_SOAK_PHASES", "0") == "1"


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    if TINY:
        jax.config.update("jax_platforms", "cpu")
        from voxtral_tpu.config import tiny_config
        from voxtral_tpu.weights import random_params
        cfg = tiny_config()
        params = quantize_params(random_params(cfg, seed=0))
    else:
        cfg = voxtral_4b(param_dtype=jnp.bfloat16,
                         compute_dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        params = quantize_params(random_params_device(cfg, seed=0))
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
        log(f"Q8 params ready in {time.perf_counter() - t0:.1f}s")
    log(f"device: {jax.devices()[0]}")

    mgr = FleetManager(params, cfg, batch=B, chunk_tokens=20, kv_dtype=KV,
                       enc_kv_dtype=ENC_KV, continuous=True,
                       n_alt=1 + ALT, alt_cutoff=0.95 if ALT else 0.0,
                       wire_dtype=WIRE, max_steps_per_poll=CAP,
                       pipeline_steps=PIPE)
    chunk_samp = mgr.chunk_samp
    chunk_s = chunk_samp / cfg.audio.sample_rate
    rng = np.random.RandomState(7)

    # per-slot lifetime plan: how much audio this stream gets before it is
    # finished and its slot reused
    target = {}        # sid -> remaining samples to feed
    fed = {}           # sid -> samples fed so far

    def new_stream():
        sid = mgr.attach()
        target[sid] = int(rng.uniform(MIN_S, MAX_S) * cfg.audio.sample_rate)
        fed[sid] = 0
        return sid

    live = [new_stream() for _ in range(B)]
    finishing = set()
    phase_s = {"stage": 0.0, "resets": 0.0}
    if PHASES:
        def timed(name, fn):
            def wrap(*a, **kw):
                t0 = time.perf_counter()
                try:
                    return fn(*a, **kw)
                finally:
                    phase_s[name] += time.perf_counter() - t0
            return wrap
        mgr._stage_sync = timed("stage", mgr._stage_sync)
        mgr._apply_resets = timed("resets", mgr._apply_resets)
    # lifetime accumulators: mgr.stats() sums only LIVE slots, and attach()
    # resets a reused slot's counters — fold a stream's numbers in as it
    # is detached so restarts/tokens cover every stream the soak served
    done_restarts = done_tokens = 0

    log(f"soak: {B} streams, Q8 + {KV} KV + {ENC_KV or KV} enc rings, "
        f"lifetimes {MIN_S:.0f}-{MAX_S:.0f}s, {SECONDS:.0f}s wall, "
        f"{WIRE} wire, n_alt={1 + ALT}, depth {DEPTH}, poll cap {CAP}, pipeline {PIPE}")
    # warmup: compile the masked step + prefill programs outside the timed
    # region (first poll otherwise lands a ~60 s compile in the stats)
    t0 = time.perf_counter()
    for _ in range(2):
        for sid in live:
            n = min(chunk_samp, target[sid] - fed[sid])
            pcm = ((rng.rand(n) - 0.5) * 0.2).astype(np.float32)
            mgr.feed(sid, pcm)
            fed[sid] += n
        mgr.poll()
    while mgr.poll():
        pass
    log(f"  warmup+compile: {time.perf_counter() - t0:.1f}s")
    hbm0 = device_memory_gb()
    log(f"  HBM at start: {hbm0}")

    poll_ms = []
    audio_fed_s = 0.0
    churn = 0
    max_depth = 0
    feed_s = 0.0
    step_ms0 = mgr.step_ms_total
    t_start = time.perf_counter()
    t_mid_logged = False
    it = 0
    while time.perf_counter() - t_start < SECONDS:
        # TOP-UP feeding: bring every live (non-finishing) stream's buffer
        # back to DEPTH chunks (i.e. feed only what the last poll
        # consumed) — the feed lead that lets poll() overlap uploads with
        # compute while keeping every step at full occupancy; retire
        # streams that hit their lifetime
        t_feed = time.perf_counter()
        for sid in list(live):
            if sid in finishing:
                continue
            while len(mgr.slots[sid].buf) < DEPTH * chunk_samp:
                n = min(chunk_samp, target[sid] - fed[sid])
                if n > 0:
                    pcm = ((rng.rand(n) - 0.5) * 0.2).astype(np.float32)
                    mgr.feed(sid, pcm)
                    fed[sid] += n
                    audio_fed_s += n / cfg.audio.sample_rate
                if fed[sid] >= target[sid]:
                    mgr.finish(sid)
                    finishing.add(sid)
                    break
        t0 = time.perf_counter()
        feed_s += t0 - t_feed
        mgr.poll()
        poll_ms.append((time.perf_counter() - t0) * 1e3)
        depth = max((len(mgr.slots[sid].buf) // chunk_samp for sid in live),
                    default=0)
        max_depth = max(max_depth, depth)
        # drain queues (text delivery path) + replace finished streams
        for sid in list(live):
            mgr.get(sid)
            if mgr.is_finished(sid):
                done_restarts += mgr.slots[sid].restarts
                done_tokens += mgr.slots[sid].generated
                mgr.detach(sid)
                live.remove(sid)
                finishing.discard(sid)
                del target[sid], fed[sid]
                nsid = new_stream()
                assert nsid == sid, (nsid, sid)   # slot actually reused
                live.append(nsid)
                churn += 1
        it += 1
        if not t_mid_logged and time.perf_counter() - t_start > SECONDS / 2:
            log(f"  mid ({it} iters, {churn} churns): HBM "
                f"{device_memory_gb()} restarts "
                f"{done_restarts + mgr.stats()['restarts']}")
            t_mid_logged = True
    wall = time.perf_counter() - t_start
    # drain what's still buffered so fed ~== consumed
    t0 = time.perf_counter()
    while mgr.poll():
        pass
    drain_s = time.perf_counter() - t0
    hbm1 = device_memory_gb()
    st = mgr.stats()
    samples = sorted(poll_ms)
    log(f"  HBM at end: {hbm1} (start {hbm0})")
    log(f"RESULT soak {SECONDS:.0f}s B={B}: "
        f"{audio_fed_s / (wall + drain_s):.1f} audio-s/s sustained "
        f"({audio_fed_s:.0f} audio-s in {wall:.1f}s + {drain_s:.1f}s drain, "
        f"{it} iters, {st['steps']} device steps) | poll "
        f"p50 {samples[len(samples) // 2]:.0f} ms "
        f"p95 {samples[int(len(samples) * 0.95)]:.0f} ms "
        f"max {samples[-1]:.0f} ms | {churn} stream churns, "
        f"{done_restarts + st['restarts']} watchdog restarts, "
        f"{done_tokens + st['generated']} tokens over all streams, "
        f"max backlog {max_depth} chunks")
    if PHASES:
        poll_s = sum(poll_ms) / 1e3
        step_s = (mgr.step_ms_total - step_ms0) / 1e3
        log(f"PHASES over {wall:.1f}s wall: feed {feed_s:.1f}s | poll "
            f"{poll_s:.1f}s = device steps (incl. overlapped staging) "
            f"{step_s:.1f}s + residual {poll_s - step_s:.1f}s | "
            f"stage total (entry-sync + overlapped) {phase_s['stage']:.1f}s "
            f"| resets {phase_s['resets']:.1f}s | outside both "
            f"{wall - feed_s - poll_s:.1f}s")


if __name__ == "__main__":
    main()
