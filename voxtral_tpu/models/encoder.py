"""Causal Whisper-style audio encoder (conv stem + 32-layer transformer).

Functional JAX re-design of the reference encoder (voxtral_encoder.c:164-693):
- batch forward: full windowed attention over the whole (padded) sequence;
- incremental forward: fixed-shape circular KV cache addressed by logical
  position — the compile-once replacement for the reference's grow/compact
  cache (voxtral_encoder.c:393-449).

Architecture notes (MODEL.md, python_simple_implementation.py:355-440): MHA
32 heads x 64, biases on wq/wv/wo/w2 but NOT wk/w1/w3, interleaved RoPE
theta=1e6, sliding window 750, RMSNorm, SwiGLU, exact (erf) GELU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.ops import (
    apply_rope, causal_conv1d, ring_decode_attention, rms_norm, rope_angles,
    windowed_attention,
)
from voxtral_tpu.ops.attention import ring_slot_positions


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def conv_stem(enc_params: dict, mel: jax.Array) -> jax.Array:
    """mel: [mel_bins, F] -> [F//2 (ceil), enc_dim] post-conv activations."""
    h = _gelu(causal_conv1d(mel, enc_params["conv0_w"], enc_params["conv0_b"], stride=1))
    h = _gelu(causal_conv1d(h, enc_params["conv1_w"], enc_params["conv1_b"], stride=2))
    return h.T


def _attn_block(lp: dict, x_norm: jax.Array, cfg, cos, sin):
    """Shared QKV+RoPE computation. x_norm: [S, D] -> q [S,H,hd], k, v."""
    s = x_norm.shape[0]
    e = cfg
    q = (x_norm @ lp["wq"] + lp["wq_b"].astype(x_norm.dtype)).reshape(s, e.heads, e.head_dim)
    k = (x_norm @ lp["wk"]).reshape(s, e.heads, e.head_dim)
    v = (x_norm @ lp["wv"] + lp["wv_b"].astype(x_norm.dtype)).reshape(s, e.heads, e.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    return q, k, v


def encoder_forward(enc_params: dict, cfg: VoxtralConfig, h: jax.Array,
                    pos_start: int = 0) -> jax.Array:
    """Batch transformer over post-conv activations h: [S, D] -> [S, D]."""
    e = cfg.encoder
    s = h.shape[0]
    positions = pos_start + jnp.arange(s)
    cos, sin = rope_angles(positions, e.head_dim, e.rope_theta)

    def layer(h, lp):
        x = rms_norm(h, lp["attn_norm"], e.norm_eps)
        q, k, v = _attn_block(lp, x, e, cos, sin)
        attn = windowed_attention(q, k, v, window=e.window)
        h = h + attn.reshape(s, e.attn_dim) @ lp["wo"] + lp["wo_b"].astype(h.dtype)
        x = rms_norm(h, lp["ffn_norm"], e.norm_eps)
        ffn = (jax.nn.silu(x @ lp["w1"]) * (x @ lp["w3"])) @ lp["w2"]
        h = h + ffn + lp["w2_b"].astype(h.dtype)
        return h, None

    h, _ = jax.lax.scan(layer, h, enc_params["layers"])
    return rms_norm(h, enc_params["norm"], e.norm_eps)


class EncoderState(NamedTuple):
    """Incremental encoder KV ring. Slot addressing is pos % ring; ring size
    must satisfy ring >= window + max_chunk so that after writing a chunk
    the oldest in-window key is still resident.

    Rings store heads MERGED into the last axis ([L, R, H*hd]) — with
    hd=64 < the 128-lane TPU tile, a [.., H, 64] layout would be padded 2x
    in HBM; the merged 2048-wide axis is layout-clean. Attention reshapes
    per-layer slices back to [R, H, hd] (a small VMEM-side temp)."""
    k_ring: jax.Array   # [L, R, H*hd]
    v_ring: jax.Array   # [L, R, H*hd]
    next_pos: jax.Array  # scalar int32: number of positions processed


def init_encoder_state(cfg: VoxtralConfig, ring_size: int = 1280,
                       dtype=None) -> EncoderState:
    e = cfg.encoder
    dt = dtype or cfg.compute_dtype
    shape = (e.layers, ring_size, e.attn_dim)
    return EncoderState(
        k_ring=jnp.zeros(shape, dt), v_ring=jnp.zeros(shape, dt),
        next_pos=jnp.zeros((), jnp.int32))


def encoder_incremental(enc_params: dict, cfg: VoxtralConfig,
                        state: EncoderState, h_chunk: jax.Array,
                        n_valid: jax.Array | int | None = None):
    """Process a chunk of S post-conv positions with the KV ring.

    h_chunk: [S, D] (rows >= n_valid are padding and masked out of state).
    Returns (new_state, out [S, D]) — rows >= n_valid are garbage.
    Equivalent to vox_encoder_forward_incremental (voxtral_encoder.c:495-693).
    """
    e = cfg.encoder
    s = h_chunk.shape[0]
    ring = state.k_ring.shape[1]
    if s + e.window > ring:
        raise ValueError(
            f"chunk {s} + window {e.window} exceeds ring {ring}; "
            "older in-window keys would be overwritten")
    start = state.next_pos
    if n_valid is None:
        n_valid = s
    n_valid = jnp.asarray(n_valid, jnp.int32)
    positions = start + jnp.arange(s, dtype=jnp.int32)
    cos, sin = rope_angles(positions, e.head_dim, e.rope_theta)
    # Padding rows park in a reserved scratch region: they write to the slot
    # just past the window of live data, which the next real chunk overwrites
    # before any masked-in read (see ops/attention.py ring docs).
    valid_row = jnp.arange(s, dtype=jnp.int32) < n_valid
    slots = jnp.where(valid_row, positions % ring, (start + n_valid) % ring)
    last_pos = start + n_valid - 1
    slot_pos = ring_slot_positions(last_pos, ring)
    q_pos = positions

    layers = enc_params["layers"]

    # fori_loop (not scan) over layers: the KV rings stay a single carry that
    # XLA updates IN PLACE — a scan's stacked ys would double ring memory.
    def body(l, carry):
        h, krs, vrs = carry
        lp = jax.tree.map(lambda a: a[l], layers)
        x = rms_norm(h, lp["attn_norm"], e.norm_eps)
        q, k, v = _attn_block(lp, x, e, cos, sin)
        krs = krs.at[l, slots].set(k.reshape(s, e.attn_dim).astype(krs.dtype))
        vrs = vrs.at[l, slots].set(v.reshape(s, e.attn_dim).astype(vrs.dtype))
        attn = ring_decode_attention(
            q, krs[l].reshape(ring, e.heads, e.head_dim),
            vrs[l].reshape(ring, e.heads, e.head_dim),
            slot_pos=slot_pos, q_pos=q_pos, window=e.window)
        h = h + attn.reshape(s, e.attn_dim) @ lp["wo"] + lp["wo_b"].astype(h.dtype)
        x = rms_norm(h, lp["ffn_norm"], e.norm_eps)
        ffn = (jax.nn.silu(x @ lp["w1"]) * (x @ lp["w3"])) @ lp["w2"]
        h = h + ffn + lp["w2_b"].astype(h.dtype)
        return (h, krs, vrs)

    h, k_rings, v_rings = jax.lax.fori_loop(
        0, e.layers, body, (h_chunk, state.k_ring, state.v_ring))
    out = rms_norm(h, enc_params["norm"], e.norm_eps)
    new_state = EncoderState(k_ring=k_rings, v_ring=v_rings,
                             next_pos=start + n_valid)
    return new_state, out
