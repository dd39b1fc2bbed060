#!/usr/bin/env python3
"""Steady-state phase breakdown + byte-roofline closure at the headline
serving config (VERDICT r4 next #1a): age the fleet past a full ring wrap
(every slot valid -> the prefix-bucketed attention reads the WHOLE ring),
time each phase as its own donated loop-carried program, and compare the
step to the HBM byte floor computed from the actual state/param shapes at
the measured platform rates (SPEED.md: Q8/bf16 weight stream ~576 GB/s,
ring DMA ceiling ~475 GB/s, logits pattern floor ~410 GB/s).

Round 3 closed the B=32 config this way (steady = ~96% of the floor);
round 4's B=40 + int4-encoder-ring default only had a FRESH breakdown.

Usage: VOX_PROF_STREAMS=40 VOX_PROF_ENC_KV=int4 python tools/profile_steady_phases.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import voxtral_4b
from voxtral_tpu.models.adapter import adapter_forward
from voxtral_tpu.models.decoder import (
    ada_scales, decode_scan, time_conditioning)
from voxtral_tpu.models.encoder import encoder_incremental
from voxtral_tpu.runtime.fleet import (
    _batched_causal_conv, _device_log_mel, age_fleet_state, fleet_step_pcm,
    init_fleet_state)
from voxtral_tpu.weights import random_params_device

B = int(os.environ.get("VOX_PROF_STREAMS", "40"))
ENC_KV = os.environ.get("VOX_PROF_ENC_KV", "int4") or None
T = int(os.environ.get("VOX_PROF_CHUNK_MEL", "160"))
KV = os.environ.get("VOX_PROF_KV", "int8")
Q8 = os.environ.get("VOX_PROF_Q8", "1") == "1"
AGE = int(os.environ.get("VOX_PROF_AGE", "4000"))   # decode positions

# measured platform rates (GB/s) the floor is computed at — see SPEED.md
R_WEIGHTS = 576e9     # Q8 weight stream (XLA mixed dot; bf16 dot is 633)
R_RING = 475e9        # fused-kernel ring DMA ceiling (pattern floor)
R_LOGITS = 410e9      # tied-embed logits+argmax pattern floor

cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
print(f"config: B={B} T={T} q8={Q8} kv={KV} enc_kv={ENC_KV} age={AGE}",
      file=sys.stderr)
params = random_params_device(cfg, seed=0)
jax.block_until_ready(params)
if Q8:
    from voxtral_tpu.quant import quantize_params
    params = quantize_params(params)
    jax.block_until_ready(params)
t_ada = ada_scales(params["decoder"],
                   time_conditioning(cfg.streaming.delay_tokens,
                                     cfg.decoder.dim))


def make_state():
    st = init_fleet_state(cfg, batch=B, enc_ring=750 + T // 2 + 10,
                          dec_ring=2048, max_mel_chunk=T, kv_dtype=KV,
                          enc_kv_dtype=ENC_KV)
    return age_fleet_state(cfg, st, AGE)


state = make_state()
rng = np.random.RandomState(0)
hop = cfg.audio.hop_length
pcm = jnp.asarray((rng.rand(B, T * hop) - 0.5).astype(np.float32))


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:32s} {ms:8.2f} ms", file=sys.stderr)
    return out, ms


def timeit_carry(name, fn, carry, *args, iters=8):
    carry, out = fn(carry, *args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, out = fn(carry, *args)
    _sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:32s} {ms:8.2f} ms", file=sys.stderr)
    return carry, out, ms


@jax.jit
def p_mel(state, pcm):
    return _device_log_mel(cfg, state.pcm_tail, pcm)


@jax.jit
def p_conv(enc_p, state, mel):
    x0 = jnp.concatenate([state.mel_tail, mel], axis=2)
    y = _batched_causal_conv(x0, enc_p["conv0_w"], enc_p["conv0_b"], 1, 2)
    x1 = jnp.concatenate([state.conv0_tail, y], axis=2)
    c = _batched_causal_conv(x1, enc_p["conv1_w"], enc_p["conv1_b"], 2, 1)
    return jnp.swapaxes(c, 1, 2).astype(cfg.compute_dtype)


@partial(jax.jit, donate_argnums=0)
def p_encoder(enc_state, enc_p, h):
    return encoder_incremental(enc_p, cfg, enc_state, h)


@jax.jit
def p_adapter(ada_p, enc_out):
    return jax.vmap(lambda e: adapter_forward(ada_p, cfg, e))(enc_out)


@partial(jax.jit, donate_argnums=0)
def p_decode(dec_state, dec_p, frames, t_ada):
    n = frames.shape[1]
    st, toks, _ = decode_scan(dec_p, cfg, dec_state, frames,
                              jnp.full((B,), n, jnp.int32), t_ada)
    return st, toks


(mel, _), t_mel = timeit("device mel", p_mel, state, pcm)
h, t_conv = timeit("conv stem", p_conv, params["encoder"], state, mel)
enc_state, enc_out, t_enc = timeit_carry("encoder chunk (aged, 32L)",
                                         p_encoder, state.encoder,
                                         params["encoder"], h)
frames, t_ad = timeit("adapter", p_adapter, params["adapter"], enc_out)
dec_state, dec_out, t_dec = timeit_carry(
    f"decode scan (aged, {T//8} tokens)", p_decode, state.decode,
    params["decoder"], frames, t_ada)

# -- byte accounting from the ACTUAL shapes ---------------------------------
def tree_bytes(t):
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(t))


dec = state.decode
n_tok = T // 8
L = cfg.decoder.layers
phys_d = dec.k_ring[0].shape[1]
ring_iter = sum(dec.k_ring[i].nbytes + dec.v_ring[i].nbytes
                for i in range(L))
if dec.k_scale is not None:
    ring_iter += sum(dec.k_scale[i].nbytes + dec.v_scale[i].nbytes
                     for i in range(L))
embed = params["decoder"]["embed"]
logits_bytes = tree_bytes(embed)
dec_w = tree_bytes(params["decoder"]) - logits_bytes
enc = state.encoder
phys_e = enc.k_ring[0].shape[1]
Le = cfg.encoder.layers
enc_ring_chunk = sum(enc.k_ring[i].nbytes + enc.v_ring[i].nbytes
                     for i in range(Le))
if enc.k_scale is not None:
    enc_ring_chunk += sum(enc.k_scale[i].nbytes + enc.v_scale[i].nbytes
                          for i in range(Le))
enc_w = tree_bytes(params["encoder"]) + tree_bytes(params["adapter"])

floor_iter_ms = (dec_w / R_WEIGHTS + logits_bytes / R_LOGITS
                 + ring_iter / R_RING) * 1e3
floor_dec_ms = n_tok * floor_iter_ms
floor_enc_ms = (enc_w / R_WEIGHTS + enc_ring_chunk / R_RING) * 1e3
print(f"\ndecoder: ring phys={phys_d}, {ring_iter/1e9:.2f} GB rings + "
      f"{dec_w/1e9:.2f} GB layer weights + {logits_bytes/1e9:.2f} GB embed "
      f"per iter -> floor {floor_iter_ms:.2f} ms/iter, "
      f"{floor_dec_ms:.1f} ms/scan (measured {t_dec:.1f}, "
      f"{100*floor_dec_ms/t_dec:.0f}% of floor)", file=sys.stderr)
print(f"encoder: ring phys={phys_e}, {enc_ring_chunk/1e9:.2f} GB rings + "
      f"{enc_w/1e9:.2f} GB weights per chunk -> floor {floor_enc_ms:.1f} ms "
      f"(measured {t_enc:.1f}; MXU matmul share ~{22.0*B/25:.0f} ms at 90% "
      f"peak scales from the B=25 probe)", file=sys.stderr)

del mel, h, enc_state, enc_out, frames, dec_state, dec_out, state

state2 = make_state()
toks = None


def full(state, pcm, t_ada):
    st, tok, _ = fleet_step_pcm(params, cfg, state, pcm, t_ada)
    return st, tok


state2, toks, t_full = timeit_carry("full fleet_step_pcm (aged)", full,
                                    state2, pcm, t_ada)
phase_sum = t_mel + t_conv + t_enc + t_ad + t_dec
floor_full = floor_dec_ms + floor_enc_ms  # mel/conv/adapter compute-bound
audio_s = B * (T / 100.0) / (t_full / 1e3)
print(f"\nsum of phases {phase_sum:.1f} ms vs full step {t_full:.1f} ms; "
      f"byte floor (dec scan + enc chunk only) {floor_full:.1f} ms -> "
      f"step is {100*floor_full/t_full:.0f}% floor-bound; "
      f"{audio_s:.1f} audio-s/s steady", file=sys.stderr)
