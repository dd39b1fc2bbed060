#!/usr/bin/env python3
"""Benchmark: streaming transcription throughput on one TPU chip.

Headline metric (BASELINE.json): audio-seconds processed per second per chip.
The reference engine's headline is ~2.5x real-time on an M3 Max
(README.md:328, RTF 0.3998 SPEED.md:8-18); vs_baseline is measured against
that 2.5 audio-s/s.

Model: flagship Voxtral Realtime 4B shapes, bf16 weights (randomly
initialized on device — throughput is weight-value independent), B
concurrent streams decoding in lockstep through the fleet step. Also reports
single-stream RTF and per-token decode latency on stderr.

Output: ONE JSON line on stdout.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.models.decoder import ada_scales, time_conditioning
from voxtral_tpu.runtime.fleet import (
    age_fleet_state, fleet_bootstrap_pcm, fleet_step_pcm, init_fleet_state)
from voxtral_tpu.weights import random_params_device

BASELINE_AUDIO_S_PER_S = 2.5   # reference headline (README.md:328)
# encoder ring: window 750 + 80 pending positions (the bootstrap runs in
# pending-sized sub-chunks, so the ring no longer needs bootstrap headroom)
ENC_RING = int(os.environ.get("VOX_BENCH_ENC_RING", "840"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_fleet(params, cfg, t_ada, batch, chunk_mel, enc_ring, dec_ring,
                warmup=2, iters=8, kv_dtype="float", enc_kv_dtype=None):
    state = init_fleet_state(cfg, batch=batch, enc_ring=enc_ring,
                             dec_ring=dec_ring, max_mel_chunk=chunk_mel,
                             kv_dtype=kv_dtype, enc_kv_dtype=enc_kv_dtype)
    rng = np.random.RandomState(0)
    hop = cfg.audio.hop_length
    # raw PCM in: the step computes mel on device (fleet_step_pcm)
    pcm0 = jnp.asarray((rng.rand(batch, 320 * hop) - 0.5).astype(np.float32))
    pcm = jnp.asarray((rng.rand(batch, chunk_mel * hop) - 0.5)
                      .astype(np.float32))
    t0 = time.perf_counter()
    state, tokens, _ = fleet_bootstrap_pcm(params, cfg, state, pcm0, t_ada)
    # Host transfer each sync point: on the axon tunnel, block_until_ready
    # can swallow async device failures (an OOM once masqueraded as a
    # 0.2 ms "step") — np.asarray forces a real round-trip and raises.
    np.asarray(tokens)
    log(f"  bootstrap+compile: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(warmup):
        state, tokens, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
    np.asarray(tokens)
    log(f"  warmup ({warmup} steps): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(iters):
        state, tokens, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
        np.asarray(tokens)
    dt = time.perf_counter() - t0
    audio_s = batch * (chunk_mel / 100.0) * iters
    step_ms = dt / iters * 1e3
    tokens_per_step = batch * chunk_mel // 8
    return {
        "audio_s_per_s": audio_s / dt,
        "step_ms": step_ms,
        "ms_per_token": step_ms / tokens_per_step,
    }


def bench_steady(params, cfg, t_ada, batch, chunk_mel, enc_ring, dec_ring,
                 iters=8, kv_dtype="int8", enc_kv_dtype=None):
    """Ring-FULL (steady-state) throughput: what a long-running stream
    (context past the 2048-slot decode ring, i.e. > ~164 s of audio) costs.
    The main fleet number above is measured at fresh-stream contexts
    (~240 decode positions — comparable to the reference's benchmark corpus
    of 5-89 s clips); at steady state the prefix-bucketed attention reads
    the whole ring, ~3.6 GB/token-step of extra HBM traffic at B=32."""
    state = init_fleet_state(cfg, batch=batch, enc_ring=enc_ring,
                             dec_ring=dec_ring, max_mel_chunk=chunk_mel,
                             kv_dtype=kv_dtype, enc_kv_dtype=enc_kv_dtype)
    state = age_fleet_state(cfg, state, 4096)
    rng = np.random.RandomState(2)
    hop = cfg.audio.hop_length
    pcm = jnp.asarray((rng.rand(batch, chunk_mel * hop) - 0.5)
                      .astype(np.float32))
    state, tokens, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
    np.asarray(tokens)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, tokens, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
        np.asarray(tokens)
    dt = time.perf_counter() - t0
    audio_s = batch * (chunk_mel / 100.0) * iters
    return {"audio_s_per_s": audio_s / dt, "step_ms": dt / iters * 1e3}


def bench_latency_serving(params, cfg, dec_ring, chunk_tokens=6,
                          warmup=12, iters=50, kv_dtype="int8"):
    """TRUE streaming token latency at the API surface (BASELINE.md:39-40,
    the "-I 0.5 with --alt" configuration): one stream through the full
    FleetManager serving path — host buffering, staging/upload, the masked
    fleet step WITH the alt-token top-k active (collect_topk over the
    131072-wide logits, BASELINE config #3), watchdog bookkeeping, the
    host alt-cutoff walk, and queue delivery. Each feed is one 0.48 s
    chunk (6 tokens; -I 0.5 rounded to the 80 ms token grid), so the wall
    time from feeding a chunk's audio to its tokens landing on the host IS
    every one of those tokens' latency.

    Latency mode (round 4): max_steps_per_poll=1 bounds EVERY poll to one
    device step. A watchdog full-reset recovery (prompt replay +
    pushed-back audio, ~6-7 chunks — the round-3 p95 outlier source)
    drains over the catch-up polls a real-time caller issues in the
    ~400 ms of idle between 0.48 s feeds, instead of one ~390 ms burst.
    Every poll (first + catch-up) is timed and enters the distribution,
    so p95 is honest about the recovery work while measuring what a
    caller actually waits per call."""
    from voxtral_tpu.runtime.manager import FleetManager
    mgr = FleetManager(params, cfg, batch=1, chunk_tokens=chunk_tokens,
                       dec_ring=dec_ring, kv_dtype=kv_dtype,
                       continuous=True, n_alt=2, alt_cutoff=0.95,
                       max_steps_per_poll=1)
    sid = mgr.attach()
    rng = np.random.RandomState(1)
    chunk = mgr.chunk_samp

    def feed_poll():
        """([per-poll ms], catch_up_polls) for one feed: the first poll
        carries the feed's own chunk; extra polls drain recovery backlog
        (none in steady state)."""
        pcm = ((rng.rand(chunk) - 0.5) * 0.2).astype(np.float32)
        t0 = time.perf_counter()
        mgr.feed(sid, pcm)
        took = mgr.poll()
        polls = [(time.perf_counter() - t0) * 1e3]
        while took:
            t0 = time.perf_counter()
            took = mgr.poll()
            if took:
                polls.append((time.perf_counter() - t0) * 1e3)
        return polls, len(polls) - 1

    for _ in range(warmup):
        feed_poll()
    n0 = mgr.slots[sid].generated
    raw = [feed_poll() for _ in range(iters)]
    emitted = mgr.slots[sid].generated - n0
    samples = sorted(ms for polls, _ in raw for ms in polls)
    recoveries = [c for _, c in raw if c > 0]
    return {
        "p50_ms": samples[len(samples) // 2],
        "p95_ms": samples[int(len(samples) * 0.95)],
        "max_poll_ms": samples[-1],
        "restart_recoveries": len(recoveries),
        "recovery_catchup_polls": (sum(recoveries) / len(recoveries))
                                  if recoveries else 0.0,
        "chunk_s": chunk_tokens * 0.08,
        "tokens_per_feed": emitted / iters,
    }


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    log("initializing 4B random params on device (bf16)...")
    t0 = time.perf_counter()
    params = random_params_device(cfg, seed=0)
    # forced host transfer, not block_until_ready: an async device OOM here
    # would otherwise be swallowed and misattributed to bootstrap (CLAUDE.md)
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
    log(f"  params ready in {time.perf_counter() - t0:.1f}s")
    t_ada = ada_scales(params["decoder"],
                       time_conditioning(cfg.streaming.delay_tokens,
                                         cfg.decoder.dim))

    chunk_mel = int(os.environ.get("VOX_BENCH_CHUNK_MEL", "160"))

    # bf16 north-star configs (BASELINE.md:35 ">=50x per chip at bf16"):
    # measured BEFORE quantization on the same bf16 param tree. Strict =
    # bf16 weights + bf16 KV rings; the int8-KV variant keeps weight
    # precision and halves ring state (the reference's own default KV cache
    # is fp16, voxtral.c:189-190, i.e. below weight precision). Stream
    # counts from the 08-19 memory-fit sweep (tools/profile_bf16.py).
    bf16 = {}
    if os.environ.get("VOX_BENCH_BF16", "1") == "1":
        b_strict = int(os.environ.get("VOX_BENCH_BF16_STREAMS", "14"))
        log(f"bf16 weights fleet (strict: bf16 KV), {b_strict} streams:")
        # B=14 strict bf16 is a 16 GB-fit cliff config: the unroll-4 decode
        # scan's larger step temps push its compile ~0.5 GB over (measured
        # 08-20); run this section at unroll 1 (tokens bit-identical —
        # unroll is pure scheduling; strict measured 71.3-71.5 at unroll 1)
        from voxtral_tpu.models import decoder as _dec
        prev_unroll = _dec._SCAN_UNROLL
        _dec._SCAN_UNROLL = 1
        jax.clear_caches()
        try:
            r = bench_fleet(params, cfg, t_ada, b_strict, chunk_mel,
                            enc_ring=ENC_RING, dec_ring=2048, warmup=2,
                            iters=5, kv_dtype="float")
        finally:
            _dec._SCAN_UNROLL = prev_unroll
            jax.clear_caches()
        log(f"  {r['audio_s_per_s']:.1f} audio-s/s | step {r['step_ms']:.1f} ms")
        bf16["bf16_audio_s_per_s"] = round(r["audio_s_per_s"], 2)
        bf16["bf16_streams"] = b_strict
        # 26 streams fit since the int8 encoder pending block (08-20):
        # 117.7 audio-s/s measured vs 112.7 at B=25 (SPEED.md bf16 campaign)
        b_i8 = int(os.environ.get("VOX_BENCH_BF16_I8_STREAMS", "26"))
        log(f"bf16 weights fleet (int8 KV rings), {b_i8} streams:")
        r = bench_fleet(params, cfg, t_ada, b_i8, chunk_mel,
                        enc_ring=ENC_RING, dec_ring=2048, warmup=2, iters=5,
                        kv_dtype="int8")
        log(f"  {r['audio_s_per_s']:.1f} audio-s/s | step {r['step_ms']:.1f} ms")
        bf16["bf16_int8kv_audio_s_per_s"] = round(r["audio_s_per_s"], 2)
        bf16["bf16_int8kv_streams"] = b_i8
        # int4-PACKED encoder rings (round 4): the encoder ring is the
        # largest per-stream state item and its attention runs once per
        # chunk, so nibble packing (in-kernel unpack) halves it nearly
        # free — lifting the 16 GB fit limit from B=26 to B=31+ and the
        # bf16-weight fleet past the >=50x (125 audio-s/s) target
        # (measured 08-21: B=30 127.6 .. B=35 141.9, fit wall at 36; see SPEED.md)
        b_i4 = int(os.environ.get("VOX_BENCH_BF16_I4ENC_STREAMS", "34"))
        log(f"bf16 weights fleet (int8 decoder KV + int4 encoder rings), "
            f"{b_i4} streams:")
        r = bench_fleet(params, cfg, t_ada, b_i4, chunk_mel,
                        enc_ring=ENC_RING, dec_ring=2048, warmup=2, iters=5,
                        kv_dtype="int8", enc_kv_dtype="int4")
        log(f"  {r['audio_s_per_s']:.1f} audio-s/s | step {r['step_ms']:.1f} ms")
        bf16["bf16_int4enc_audio_s_per_s"] = round(r["audio_s_per_s"], 2)
        bf16["bf16_int4enc_streams"] = b_i4

    q8 = os.environ.get("VOX_BENCH_Q8", "1") == "1"
    if q8:
        from voxtral_tpu.quant import quantize_params
        t0 = time.perf_counter()
        params = quantize_params(params)
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(params)[0].ravel()[:1]))
        log(f"  quantized to Q8 (int8 + per-row scales) in "
            f"{time.perf_counter() - t0:.1f}s")

    kv_dtype = os.environ.get("VOX_BENCH_KV", "int8")
    # int4-packed encoder rings (round 4): at Q8 they cost nothing fresh
    # and cure the steady-state HBM pressure that made B=36 regress in
    # round 3 — the sweep optimum moved to B=40 (221.6 fresh / 175.2
    # steady measured 08-21, tools/profile_q8_sweep.py; B=44 is past it)
    enc_kv = os.environ.get("VOX_BENCH_ENC_KV", "int4") or None
    batch = int(os.environ.get("VOX_BENCH_STREAMS",
                               ("40" if kv_dtype == "int8" else "12")
                               if q8 else "8"))

    log(f"fleet: {batch} streams x {chunk_mel/100:.1f}s chunks "
        f"(dec ring 2048, enc ring {ENC_RING}, {'Q8' if q8 else 'bf16'} weights, "
        f"{kv_dtype} KV rings" + (f", {enc_kv} encoder rings" if enc_kv else "")
        + ")")
    fleet = bench_fleet(params, cfg, t_ada, batch, chunk_mel,
                        enc_ring=ENC_RING, dec_ring=2048, kv_dtype=kv_dtype,
                        enc_kv_dtype=enc_kv)
    log(f"  {fleet['audio_s_per_s']:.1f} audio-s/s | step {fleet['step_ms']:.1f} ms "
        f"| {fleet['ms_per_token']:.2f} ms/token (batched)")

    log("steady state (rings full, context > 164 s):")
    steady = bench_steady(params, cfg, t_ada, batch, chunk_mel,
                          enc_ring=ENC_RING, dec_ring=2048, kv_dtype=kv_dtype,
                          enc_kv_dtype=enc_kv)
    log(f"  {steady['audio_s_per_s']:.1f} audio-s/s | "
        f"step {steady['step_ms']:.1f} ms")

    log("single stream (B=1):")
    single = bench_fleet(params, cfg, t_ada, 1, chunk_mel,
                         enc_ring=ENC_RING, dec_ring=2048, warmup=2, iters=6,
                         kv_dtype=kv_dtype)
    log(f"  {single['audio_s_per_s']:.1f} audio-s/s | "
        f"{single['ms_per_token']:.2f} ms/token")
    # chunk-320 B=1 variant (round 5, tools/profile_b1.py): device compute
    # is flat at ~5.6-5.7 ms/token across chunk lengths (96% of the
    # unamortized-weight-stream cap), so the fixed ~27 ms link sync per
    # step is the whole B=1 gap — doubling tokens per dispatch halves its
    # per-token share (+14% measured) at the cost of 3.2 s feed granularity
    single320 = bench_fleet(params, cfg, t_ada, 1, 320,
                            enc_ring=750 + 170, dec_ring=2048, warmup=2,
                            iters=4, kv_dtype=kv_dtype)
    log(f"  chunk 3.2s: {single320['audio_s_per_s']:.1f} audio-s/s | "
        f"{single320['ms_per_token']:.2f} ms/token")

    log("streaming token latency (FleetManager B=1, -I 0.5, --alt 0.95):")
    lat = bench_latency_serving(params, cfg, dec_ring=2048,
                                kv_dtype=kv_dtype)
    log(f"  p50 {lat['p50_ms']:.1f} ms | p95 {lat['p95_ms']:.1f} ms | "
        f"max poll {lat['max_poll_ms']:.1f} ms "
        f"({lat['restart_recoveries']} watchdog-restart recoveries, each "
        f"spread over ~{lat['recovery_catchup_polls']:.1f} bounded catch-up "
        f"polls — see bench.py note) "
        f"audio-in -> token-out per {lat['chunk_s']:.2f}s feed "
        f"({lat['tokens_per_feed']:.1f} tok/feed)")

    value = fleet["audio_s_per_s"]
    print(json.dumps({
        "metric": f"audio_seconds_per_second_per_chip_{batch}streams"
                  + ("_q8" if q8 else "")
                  + ("_int8kv" if kv_dtype == "int8" else "")
                  + (f"_{enc_kv}enc" if enc_kv and enc_kv != kv_dtype
                     else ""),
        "value": round(value, 2),
        "unit": "audio_s/s",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 2),
        "extra": {
            "steady_state_audio_s_per_s": round(steady["audio_s_per_s"], 2),
            "single_stream_audio_s_per_s": round(single["audio_s_per_s"], 2),
            "single_stream_c320_audio_s_per_s":
                round(single320["audio_s_per_s"], 2),
            "batched_ms_per_token": round(fleet["ms_per_token"], 3),
            "single_ms_per_token": round(single["ms_per_token"], 3),
            # measured at the serving API surface (FleetManager poll with
            # alt top-k active), not the raw step — see bench_latency_serving
            "token_latency_p50_ms": round(lat["p50_ms"], 1),
            "token_latency_p95_ms": round(lat["p95_ms"], 1),
            # every poll is bounded to one device step (latency mode,
            # max_steps_per_poll=1): watchdog-restart recovery drains over
            # catch-up polls, all of which enter this distribution
            "token_latency_max_poll_ms": round(lat["max_poll_ms"], 1),
            "restart_recoveries": lat["restart_recoveries"],
            "recovery_catchup_polls":
                round(lat["recovery_catchup_polls"], 1),
            "streams": batch,
            "hosts": 1, "chips": 1,
            **bf16,
            # live-mode context cap: the fleet mirrors the reference's
            # STREAM_MAX_DECODE_KV=2000 live cap (voxtral.c:412), NOT the
            # offline 8192 window (VoxStream/batch pipeline keep the full
            # window); steady-state numbers are at this ring size
            "dec_ring": 2048,
        },
    }))


if __name__ == "__main__":
    main()
