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
    apply_rope, causal_conv1d, rms_norm, rope_angles, windowed_attention,
)
from voxtral_tpu.ops.linear import linear
from voxtral_tpu.ops.pallas_attention import ring_attention
from voxtral_tpu.quant import quantize_kv, quantize_kv_int4


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def conv_stem(enc_params: dict, mel: jax.Array) -> jax.Array:
    """mel: [mel_bins, F] -> [F//2 (ceil), enc_dim] post-conv activations."""
    h = _gelu(causal_conv1d(mel, enc_params["conv0_w"], enc_params["conv0_b"], stride=1))
    h = _gelu(causal_conv1d(h, enc_params["conv1_w"], enc_params["conv1_b"], stride=2))
    return h.T


def _attn_block(lp: dict, x_norm: jax.Array, cfg, cos, sin):
    """Shared QKV+RoPE computation. x_norm: [..., S, D] -> q [..., S, H, hd],
    k, v (leading batch dims preserved)."""
    e = cfg
    hs = (*x_norm.shape[:-1], e.heads, e.head_dim)
    q = linear(x_norm, lp["wq"], lp["wq_b"]).reshape(hs)
    k = linear(x_norm, lp["wk"]).reshape(hs)
    v = linear(x_norm, lp["wv"], lp["wv_b"]).reshape(hs)
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

    for lp in enc_params["layers"]:
        x = rms_norm(h, lp["attn_norm"], e.norm_eps)
        q, k, v = _attn_block(lp, x, e, cos, sin)
        attn = windowed_attention(q, k, v, window=e.window)
        h = h + linear(attn.reshape(s, e.attn_dim), lp["wo"], lp["wo_b"])
        x = rms_norm(h, lp["ffn_norm"], e.norm_eps)
        h = h + linear(jax.nn.silu(linear(x, lp["w1"])) * linear(x, lp["w3"]),
                       lp["w2"], lp["w2_b"])
    return rms_norm(h, enc_params["norm"], e.norm_eps)


SLOT_INVALID = -(1 << 30)


class EncoderState(NamedTuple):
    """Batched incremental encoder KV ring (leading axis B = streams).

    Same four design rules as the decoder (see models/decoder.py module
    docstring): per-layer ring tuples, lockstep shared cursor with a
    [B, P] slot->position table, fold-pending-before-read, and an Sp-slot
    overflow margin (P = R + Sp, writes at ctr % R, R >= window + Sp).

    Rings store heads MERGED into the last axis ([B, P, H*hd]) — with
    hd=64 < the 128-lane TPU tile, a [.., H, 64] layout would be padded 2x
    in HBM; the merged 2048-wide axis is layout-clean.

    kv_dtype="int8" mode: rings are int8 with per-(slot, head) f32 scale
    tables k_scale/v_scale (L x [B, H, P]; None in float mode). Pending
    blocks are int8 TOO (quantized at chunk end, inside the program that
    computed them — bit-identical to quantizing at fold time, since the
    same float values are quantized either way), with their own scale
    blocks pending_ks/vs; the fold is then a pure int8 copy. This halves
    pending HBM (~10 MB/stream at 4B shapes — a stream's worth of
    headroom at the 16 GB fit limit) vs float pending. The fused attention
    kernel applies scales to score/probability columns.

    kv_dtype="int4" mode: rings/pending are nibble-PACKED int4 bytes
    ([B, P, H*hd/2], quant.py:quantize_kv_int4) with the same f32 scale
    tables; the kernel unpacks in-VMEM (two int32 shifts + two half-width
    dots per sub-head). The encoder ring is the LARGEST per-stream state
    item (~121 MB/stream int8 at 4B shapes), and encoder attention runs
    once per chunk (~20 decoded tokens), so the per-element VPU unpack —
    which sank int4 for the per-token decoder rings (SPEED.md) — is paid
    20x less often here. Halving this ring is what lifts the bf16 fleet
    from B=26 to B=30 on 16 GB (the >=50x-at-bf16 campaign)."""
    k_ring: tuple        # L x [B, P, H*hd]
    v_ring: tuple        # L x [B, P, H*hd]
    k_scale: tuple | None  # L x [B, H, P] f32 (int8 mode only)
    v_scale: tuple | None
    slot_pos: jax.Array  # [B, P] int32 logical position per slot
    pending_k: tuple       # L x [B, Sp, H*hd] (int8 in int8 mode)
    pending_v: tuple       # L x [B, Sp, H*hd]
    pending_ks: tuple | None  # L x [B, H, Sp] f32 (int8 mode only)
    pending_vs: tuple | None
    pending_sp: jax.Array  # [B, Sp] int32
    pending_adv: jax.Array  # [] int32
    write_ctr: jax.Array  # [] int32 shared lockstep cursor
    next_pos: jax.Array  # [B] int32: positions processed per stream


def init_encoder_state(cfg: VoxtralConfig, ring_size: int = 1280,
                       batch: int = 1, dtype=None,
                       pending_size: int = 128,
                       kv_dtype: str = "float") -> EncoderState:
    e = cfg.encoder
    dt = dtype or cfg.compute_dtype
    # Folding a pending block of Sp columns stomps Sp slots past the cursor;
    # those must all be out-of-window, so Sp <= ring - window (which also
    # bounds the max chunk, since a chunk needs window + chunk <= ring).
    pending_size = min(pending_size, ring_size - e.window)
    # pad the RING (cursor modulus) so the physical slot axis is a multiple
    # of 32 rows: int8 tiles are (32, 128) and unaligned rings measured ~10%
    # slower to DMA; extra slots just widen the out-of-window margin
    phys = ring_size + pending_size
    if phys % 32:
        ring_size += 32 - phys % 32
        phys = ring_size + pending_size
    assert kv_dtype in ("float", "int8", "int4"), kv_dtype
    quant = kv_dtype in ("int8", "int4")
    ring_dt = jnp.int8 if quant else dt
    # int4: two values per byte, packed along the lane axis (halves
    # convention, quant.py:quantize_kv_int4)
    kw = e.attn_dim // 2 if kv_dtype == "int4" else e.attn_dim
    return EncoderState(
        k_ring=tuple(jnp.zeros((batch, phys, kw), ring_dt)
                     for _ in range(e.layers)),
        v_ring=tuple(jnp.zeros((batch, phys, kw), ring_dt)
                     for _ in range(e.layers)),
        k_scale=tuple(jnp.ones((batch, e.heads, phys), jnp.float32)
                      for _ in range(e.layers)) if quant else None,
        v_scale=tuple(jnp.ones((batch, e.heads, phys), jnp.float32)
                      for _ in range(e.layers)) if quant else None,
        slot_pos=jnp.full((batch, phys), SLOT_INVALID, jnp.int32),
        pending_k=tuple(jnp.zeros((batch, pending_size, kw), ring_dt)
                        for _ in range(e.layers)),
        pending_v=tuple(jnp.zeros((batch, pending_size, kw), ring_dt)
                        for _ in range(e.layers)),
        pending_ks=tuple(jnp.ones((batch, e.heads, pending_size), jnp.float32)
                         for _ in range(e.layers)) if quant else None,
        pending_vs=tuple(jnp.ones((batch, e.heads, pending_size), jnp.float32)
                         for _ in range(e.layers)) if quant else None,
        pending_sp=jnp.full((batch, pending_size), SLOT_INVALID, jnp.int32),
        pending_adv=jnp.zeros((), jnp.int32),
        write_ctr=jnp.zeros((), jnp.int32),
        next_pos=jnp.zeros((batch,), jnp.int32))


def reset_encoder_streams(state: EncoderState, mask: jax.Array,
                          reset_write_ctr: bool = False) -> EncoderState:
    """Per-stream encoder reset: invalidate the slot tables, positions to 0.
    reset_write_ctr only when ALL streams reset (B=1 streaming)."""
    zero = jnp.zeros((), jnp.int32)
    return state._replace(
        slot_pos=jnp.where(mask[:, None], SLOT_INVALID, state.slot_pos),
        pending_sp=jnp.where(mask[:, None], SLOT_INVALID, state.pending_sp),
        pending_adv=zero if reset_write_ctr else state.pending_adv,
        write_ctr=zero if reset_write_ctr else state.write_ctr,
        next_pos=jnp.where(mask, 0, state.next_pos))


def encoder_incremental(enc_params: dict, cfg: VoxtralConfig,
                        state: EncoderState, h_chunk: jax.Array,
                        n_valid: jax.Array | int | None = None):
    """Process a chunk of S post-conv positions per stream with the KV ring.

    h_chunk: [B, S, D] (rows >= n_valid are padding and masked out of state).
    Returns (new_state, out [B, S, D]) — rows >= n_valid are garbage.
    Equivalent to vox_encoder_forward_incremental (voxtral_encoder.c:495-693),
    with the grow/compact cache replaced by the compile-once lockstep ring.
    """
    e = cfg.encoder
    b, s, _ = h_chunk.shape
    sp_cap = state.pending_sp.shape[1]
    phys = state.k_ring[0].shape[1]
    ring = phys - sp_cap          # logical ring = cursor modulus
    if s + e.window > ring:
        raise ValueError(
            f"chunk {s} + window {e.window} exceeds ring {ring}; "
            "older in-window keys would be overwritten")
    if s > sp_cap:
        raise ValueError(f"chunk {s} exceeds pending capacity {sp_cap}")
    if n_valid is None:
        n_valid = jnp.full((b,), s, jnp.int32)
    n_valid = jnp.broadcast_to(jnp.asarray(n_valid, jnp.int32), (b,))
    rows = jnp.arange(s, dtype=jnp.int32)
    positions = state.next_pos[:, None] + rows[None, :]        # [B, S]
    cos, sin = rope_angles(positions, e.head_dim, e.rope_theta)
    chunk_pos = jnp.where(rows[None, :] < n_valid[:, None],
                          positions, SLOT_INVALID)             # [B, S]

    # Fold the previous chunk's pending KV into the rings BEFORE any ring
    # read: ONE in-place dynamic_update_slice per ring at ctr % ring (the
    # overflow margin guarantees no wrap; see models/decoder.py). The
    # pending block is stored in the ring's own dtype (int8 mode quantizes
    # at chunk end, below), so the fold is always a pure copy.
    int8_kv = state.k_scale is not None
    slot0 = state.write_ctr % ring

    def fold(ring_t, pend_t, scale_t, pscale_t):
        rings = tuple(jax.lax.dynamic_update_slice(r, p, (0, slot0, 0))
                      for r, p in zip(ring_t, pend_t))
        if not int8_kv:
            return rings, None
        scales = tuple(
            jax.lax.dynamic_update_slice(sc, ps, (0, 0, slot0))
            for sc, ps in zip(scale_t, pscale_t))
        return rings, scales

    krs, kss = fold(state.k_ring, state.pending_k, state.k_scale,
                    state.pending_ks)
    vrs, vss = fold(state.v_ring, state.pending_v, state.v_scale,
                    state.pending_vs)
    rsp = jax.lax.dynamic_update_slice(
        state.slot_pos, state.pending_sp, (0, slot0))
    base = state.write_ctr + state.pending_adv
    # Valid ring slots form a prefix (see models/decoder.py): the attention
    # kernel skips the untouched tail's DMA via a static prefix bucket.
    nv_slots = jnp.minimum(state.write_ctr + sp_cap, phys)

    h = h_chunk
    float_dt = h_chunk.dtype
    # int4-packed rings carry half the lanes (see init_encoder_state)
    int4_kv = int8_kv and state.k_ring[0].shape[-1] * 2 == e.attn_dim
    qkv = quantize_kv_int4 if int4_kv else quantize_kv
    chunk_ks, chunk_vs = [], []
    chunk_kss, chunk_vss = [], []      # int8 mode: per-chunk scale blocks
    for l, lp in enumerate(enc_params["layers"]):
        x = rms_norm(h, lp["attn_norm"], e.norm_eps)
        q, k, v = _attn_block(lp, x, e, cos, sin)
        kd = k.reshape(b, s, e.attn_dim).astype(float_dt)
        vd = v.reshape(b, s, e.attn_dim).astype(float_dt)
        if int8_kv:
            # Quantize the chunk's KV NOW (same float values the fold used
            # to quantize — bit-identical rings) so the pending block is
            # int8: half the pending HBM, and the next fold is a copy.
            # In-chunk attention still sees the float kd/vd below.
            qk, qks = qkv(kd, e.heads, e.head_dim)
            qv_, qvs = qkv(vd, e.heads, e.head_dim)
            chunk_ks.append(qk)
            chunk_vs.append(qv_)
            chunk_kss.append(qks)
            chunk_vss.append(qvs)
        else:
            chunk_ks.append(kd)
            chunk_vs.append(vd)
        # Current chunk K/V ride as extra float columns (intra-chunk
        # causality via the position mask); the ring itself stays read-only.
        attn = ring_attention(
            q.reshape(b, s, e.attn_dim), krs[l], vrs[l], rsp, positions,
            window=e.window, heads=e.heads, kv_heads=e.heads,
            head_dim=e.head_dim,
            k_scale=None if kss is None else kss[l],
            v_scale=None if vss is None else vss[l],
            extra_kv=(kd, vd, chunk_pos),
            n_valid_slots=nv_slots)
        h = h + linear(attn.reshape(b, s, e.attn_dim), lp["wo"], lp["wo_b"])
        x = rms_norm(h, lp["ffn_norm"], e.norm_eps)
        h = h + linear(jax.nn.silu(linear(x, lp["w1"])) * linear(x, lp["w3"]),
                       lp["w2"], lp["w2_b"])
    out = rms_norm(h, enc_params["norm"], e.norm_eps)

    if s < sp_cap:
        pk = tuple(jax.lax.dynamic_update_slice(jnp.zeros_like(p), c, (0, 0, 0))
                   for p, c in zip(state.pending_k, chunk_ks))
        pv = tuple(jax.lax.dynamic_update_slice(jnp.zeros_like(p), c, (0, 0, 0))
                   for p, c in zip(state.pending_v, chunk_vs))
        psp = jax.lax.dynamic_update_slice(
            jnp.full_like(state.pending_sp, SLOT_INVALID), chunk_pos, (0, 0))
        if int8_kv:
            pks = tuple(
                jax.lax.dynamic_update_slice(jnp.ones_like(p), c, (0, 0, 0))
                for p, c in zip(state.pending_ks, chunk_kss))
            pvs = tuple(
                jax.lax.dynamic_update_slice(jnp.ones_like(p), c, (0, 0, 0))
                for p, c in zip(state.pending_vs, chunk_vss))
    else:
        pk, pv, psp = tuple(chunk_ks), tuple(chunk_vs), chunk_pos
        if int8_kv:
            pks, pvs = tuple(chunk_kss), tuple(chunk_vss)
    if not int8_kv:
        pks = pvs = None
    # Cursor advances by the longest valid prefix: trailing padding columns
    # are re-written by the next chunk, so a B=1 stream never lags its
    # cursor (zero burn); heterogeneous fleets burn by their lag fraction.
    new_state = EncoderState(
        k_ring=krs, v_ring=vrs, k_scale=kss, v_scale=vss, slot_pos=rsp,
        pending_k=pk, pending_v=pv, pending_ks=pks, pending_vs=pvs,
        pending_sp=psp,
        pending_adv=jnp.max(jnp.minimum(n_valid, s)).astype(jnp.int32),
        write_ctr=base,
        next_pos=state.next_pos + jnp.minimum(n_valid, s))
    return new_state, out
