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
                warmup=2, iters=8, kv_dtype="float"):
    state = init_fleet_state(cfg, batch=batch, enc_ring=enc_ring,
                             dec_ring=dec_ring, max_mel_chunk=chunk_mel,
                             kv_dtype=kv_dtype)
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
                 iters=8, kv_dtype="int8"):
    """Ring-FULL (steady-state) throughput: what a long-running stream
    (context past the 2048-slot decode ring, i.e. > ~164 s of audio) costs.
    The main fleet number above is measured at fresh-stream contexts
    (~240 decode positions — comparable to the reference's benchmark corpus
    of 5-89 s clips); at steady state the prefix-bucketed attention reads
    the whole ring, ~3.6 GB/token-step of extra HBM traffic at B=32."""
    state = init_fleet_state(cfg, batch=batch, enc_ring=enc_ring,
                             dec_ring=dec_ring, max_mel_chunk=chunk_mel,
                             kv_dtype=kv_dtype)
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


def bench_latency(params, cfg, t_ada, enc_ring, dec_ring, chunk_mel=48,
                  warmup=3, iters=40, kv_dtype="int8"):
    """Low-latency streaming config (BASELINE.json headline, -I 0.5): one
    stream, ~0.5 s chunks, each feed individually synced — the time from a
    chunk's audio arriving to its tokens landing on the host IS the
    streaming token latency (all of a chunk's tokens emerge at step end).
    Returns p50/p95 over `iters` feeds."""
    state = init_fleet_state(cfg, batch=1, enc_ring=enc_ring,
                             dec_ring=dec_ring, max_mel_chunk=160,
                             kv_dtype=kv_dtype)
    rng = np.random.RandomState(1)
    hop = cfg.audio.hop_length
    pcm0 = jnp.asarray((rng.rand(1, 320 * hop) - 0.5).astype(np.float32))
    pcm = jnp.asarray((rng.rand(1, chunk_mel * hop) - 0.5).astype(np.float32))
    state, tokens, _ = fleet_bootstrap_pcm(params, cfg, state, pcm0, t_ada)
    np.asarray(tokens)
    for _ in range(warmup):
        state, tokens, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
        np.asarray(tokens)
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, tokens, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
        np.asarray(tokens)
        samples.append((time.perf_counter() - t0) * 1e3)
    samples.sort()
    return {
        "p50_ms": samples[len(samples) // 2],
        "p95_ms": samples[int(len(samples) * 0.95)],
        "chunk_s": chunk_mel / 100.0,
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
    batch = int(os.environ.get("VOX_BENCH_STREAMS",
                               ("32" if kv_dtype == "int8" else "12")
                               if q8 else "8"))
    chunk_mel = int(os.environ.get("VOX_BENCH_CHUNK_MEL", "160"))

    log(f"fleet: {batch} streams x {chunk_mel/100:.1f}s chunks "
        f"(dec ring 2048, enc ring {ENC_RING}, {'Q8' if q8 else 'bf16'} weights, "
        f"{kv_dtype} KV rings)")
    fleet = bench_fleet(params, cfg, t_ada, batch, chunk_mel,
                        enc_ring=ENC_RING, dec_ring=2048, kv_dtype=kv_dtype)
    log(f"  {fleet['audio_s_per_s']:.1f} audio-s/s | step {fleet['step_ms']:.1f} ms "
        f"| {fleet['ms_per_token']:.2f} ms/token (batched)")

    log("steady state (rings full, context > 164 s):")
    steady = bench_steady(params, cfg, t_ada, batch, chunk_mel,
                          enc_ring=ENC_RING, dec_ring=2048, kv_dtype=kv_dtype)
    log(f"  {steady['audio_s_per_s']:.1f} audio-s/s | "
        f"step {steady['step_ms']:.1f} ms")

    log("single stream (B=1):")
    single = bench_fleet(params, cfg, t_ada, 1, chunk_mel,
                         enc_ring=ENC_RING, dec_ring=2048, warmup=2, iters=6,
                         kv_dtype=kv_dtype)
    log(f"  {single['audio_s_per_s']:.1f} audio-s/s | "
        f"{single['ms_per_token']:.2f} ms/token")

    log("streaming latency (B=1, -I 0.5 equivalent, 0.48s chunks):")
    lat = bench_latency(params, cfg, t_ada, enc_ring=ENC_RING, dec_ring=2048,
                        kv_dtype=kv_dtype)
    log(f"  p50 {lat['p50_ms']:.1f} ms | p95 {lat['p95_ms']:.1f} ms "
        f"per {lat['chunk_s']:.2f}s feed")

    value = fleet["audio_s_per_s"]
    print(json.dumps({
        "metric": f"audio_seconds_per_second_per_chip_{batch}streams"
                  + ("_q8" if q8 else "")
                  + ("_int8kv" if kv_dtype == "int8" else ""),
        "value": round(value, 2),
        "unit": "audio_s/s",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 2),
        "extra": {
            "steady_state_audio_s_per_s": round(steady["audio_s_per_s"], 2),
            "single_stream_audio_s_per_s": round(single["audio_s_per_s"], 2),
            "batched_ms_per_token": round(fleet["ms_per_token"], 3),
            "single_ms_per_token": round(single["ms_per_token"], 3),
            "stream_latency_p50_ms": round(lat["p50_ms"], 1),
            "stream_latency_p95_ms": round(lat["p95_ms"], 1),
            "streams": batch,
            # live-mode context cap: the fleet mirrors the reference's
            # STREAM_MAX_DECODE_KV=2000 live cap (voxtral.c:412), NOT the
            # offline 8192 window (VoxStream/batch pipeline keep the full
            # window); steady-state numbers are at this ring size
            "dec_ring": 2048,
        },
    }))


if __name__ == "__main__":
    main()
