#!/usr/bin/env python3
"""Phase breakdown of the fleet step at the bench config: device mel,
conv stem, encoder chunk, adapter, decode scan — each timed as its own
jitted program over the SAME fleet state (donation off to keep it alive).

HBM is tight: 4B Q8 params (~4.5 GB) + B x (enc+dec int8 rings). Run with
VOX_PROF_STREAMS / VOX_PROF_CHUNK_MEL to vary.
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
from voxtral_tpu.models.decoder import ada_scales, decode_scan, time_conditioning
from voxtral_tpu.models.encoder import encoder_incremental
from voxtral_tpu.runtime.fleet import (
    _batched_causal_conv, _device_log_mel, fleet_step_pcm, init_fleet_state)
from voxtral_tpu.weights import random_params_device

B = int(os.environ.get("VOX_PROF_STREAMS", "32"))
ENC_KV = os.environ.get("VOX_PROF_ENC_KV", "") or None
T = int(os.environ.get("VOX_PROF_CHUNK_MEL", "160"))
KV = os.environ.get("VOX_PROF_KV", "int8")
Q8 = os.environ.get("VOX_PROF_Q8", "1") == "1"

cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
print(f"config: B={B} T={T} q8={Q8} kv={KV} enc_kv={ENC_KV}", file=sys.stderr)
params = random_params_device(cfg, seed=0)
jax.block_until_ready(params)
if Q8:
    from voxtral_tpu.quant import quantize_params
    params = quantize_params(params)
    jax.block_until_ready(params)
t_ada = ada_scales(params["decoder"],
                   time_conditioning(cfg.streaming.delay_tokens,
                                     cfg.decoder.dim))

# pending sized to the profiled chunk, not the 320-mel bootstrap (the
# production fleet splits the bootstrap into pending-sized sub-chunks);
# bootstrap-sized pending OOMs the bf16-weights config at B=25
state = init_fleet_state(cfg, batch=B, enc_ring=750 + T // 2 + 10,
                         dec_ring=2048, max_mel_chunk=T, kv_dtype=KV, enc_kv_dtype=ENC_KV)
rng = np.random.RandomState(0)
hop = cfg.audio.hop_length
pcm = jnp.asarray((rng.rand(B, T * hop) - 0.5).astype(np.float32))


def _sync(out):
    """block_until_ready can return early through the axon tunnel (see
    bench.py) — force a real host round-trip on one small leaf."""
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
    """Loop-carried timing for state->state programs (donated carry): each
    iteration consumes the previous one's state, so dispatches can't overlap
    and HBM holds ONE copy of the rings (see SPEED.md 'loop-invariant scan
    benchmarks' / the B=32 profiler OOM)."""
    carry, out = fn(carry, *args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, out = fn(carry, *args)
    _sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:32s} {ms:8.2f} ms", file=sys.stderr)
    return carry, out, ms


# params must be explicit jit args: closed-over device arrays are baked
# into the lowered HLO as constants and the axon remote-compile endpoint
# rejects the multi-GB request body (HTTP 413).
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
# The encoder/decode phases donate + loop-carry their ring state: one copy
# of the rings in HBM (non-donated timing OOMs at B=32) and no dispatch
# overlap between iterations. The donated buffers are shared with `state`,
# so it is re-initialized below before the full-step timing.
enc_state, enc_out, t_enc = timeit_carry("encoder chunk (32L)", p_encoder,
                                         state.encoder, params["encoder"], h)
frames, t_ad = timeit("adapter", p_adapter, params["adapter"], enc_out)
dec_state, dec_out, t_dec = timeit_carry(
    f"decode scan ({T//8} tokens)", p_decode, state.decode,
    params["decoder"], frames, t_ada)

# free phase intermediates before the full step (HBM is tight)
del mel, h, enc_state, enc_out, frames, dec_state, dec_out, state

s2 = init_fleet_state(cfg, batch=B, enc_ring=912, dec_ring=2048,
                      max_mel_chunk=320, kv_dtype=KV, enc_kv_dtype=ENC_KV)
s2, tok, _ = fleet_step_pcm(params, cfg, s2, pcm, t_ada)  # compile (donates)
np.asarray(tok)
t0 = time.perf_counter()
N = 8
for _ in range(N):
    s2, tok, _ = fleet_step_pcm(params, cfg, s2, pcm, t_ada)
np.asarray(tok)
t_full = (time.perf_counter() - t0) / N * 1e3
print(f"{'full fleet_step_pcm':32s} {t_full:8.2f} ms", file=sys.stderr)
parts = t_mel + t_conv + t_enc + t_ad + t_dec
print(f"{'sum of phases':32s} {parts:8.2f} ms "
      f"(overhead {t_full - parts:+.2f})", file=sys.stderr)
print(f"decode: {t_dec / (T // 8):.2f} ms/iter at B={B} "
      f"-> {t_dec / (T // 8) / B * 1e3:.1f} us/stream-token", file=sys.stderr)
