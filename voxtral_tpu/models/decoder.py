"""Ministral-3 text decoder with fixed-shape circular KV cache and
scan-based multi-token greedy decode.

Reference semantics: voxtral_decoder.c:447-780 and
python_simple_implementation.py:469-664. GQA 32Q/8KV x 128, SwiGLU 9216,
no biases, interleaved RoPE theta=1e6, sliding window 8192, tied embeddings
(logits = h @ embed.T in f32), per-layer ada_rms_norm time conditioning
applied after ffn_norm: h_norm * (1 + ada_scale).

TPU redesign vs the reference:
- The grow/memmove KV cache (voxtral_decoder.c:251-384) becomes a circular
  buffer [L, W, Hkv, hd] addressed pos % W with masking by logical position;
  one compile covers unlimited audio. Resetting a stream is pos := 0 — stale
  slots alias to negative logical positions and are masked out.
- The reference pays one device sync per token (voxtral_metal.m:2888-3174);
  here a whole backlog of adapter frames decodes in ONE lax.scan dispatch
  (greedy feedback carried on device), with bucket padding + n_valid masking
  so streaming intervals never recompile.
- All state is batched over a leading stream axis: concurrent streams share
  each weight read, which is what makes a bandwidth-bound 4B decoder scale
  past real-time on one chip.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.ops import apply_rope, ring_decode_attention, rms_norm, rope_angles
from voxtral_tpu.ops.attention import ring_slot_positions, windowed_attention


def time_conditioning(delay_tokens: float, dim: int, theta: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding of the transcription delay
    (python_simple_implementation.py:344-349). Returns [dim] f32."""
    half = dim // 2
    inv_freq = jnp.exp(-math.log(theta) * jnp.arange(half, dtype=jnp.float32) / half)
    emb = float(delay_tokens) * inv_freq
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)])


def ada_scales(dec_params: dict, t_cond: jax.Array) -> jax.Array:
    """Precompute per-layer ada scales [L, D] once per delay setting
    (the reference computes this at load: voxtral.c:57-79)."""
    layers = dec_params["layers"]
    tc = t_cond.astype(jnp.float32)
    hidden = jax.nn.gelu(
        jnp.einsum("d,lde->le", tc, layers["ada_down"].astype(jnp.float32)),
        approximate=False)
    return jnp.einsum("le,led->ld", hidden, layers["ada_up"].astype(jnp.float32))


class DecodeState(NamedTuple):
    """Batched decoder stream state (leading axis B = concurrent streams).

    Rings store KV heads MERGED into the last axis ([B, L, W, Hkv*hd]):
    a [..., 8, 128] bf16 layout would pad the 8-sublane axis to 16 (2x HBM);
    the merged 1024-wide axis is layout-clean. Attention reshapes per-layer
    slices back to [W, Hkv, hd]."""
    k_ring: jax.Array     # [B, L, W, Hkv*hd]
    v_ring: jax.Array     # [B, L, W, Hkv*hd]
    pos: jax.Array        # [B] int32 next decode position
    prev_token: jax.Array  # [B] int32
    done: jax.Array       # [B] bool (EOS seen)


def init_decode_state(cfg: VoxtralConfig, batch: int = 1, dtype=None) -> DecodeState:
    d = cfg.decoder
    dt = dtype or cfg.compute_dtype
    shape = (batch, d.layers, d.window, d.kv_dim)
    return DecodeState(
        k_ring=jnp.zeros(shape, dt),
        v_ring=jnp.zeros(shape, dt),
        pos=jnp.zeros((batch,), jnp.int32),
        prev_token=jnp.full((batch,), 1, jnp.int32),   # BOS
        done=jnp.zeros((batch,), bool),
    )


def reset_streams(state: DecodeState, mask: jax.Array,
                  bos_token: int = 1) -> DecodeState:
    """Host-driven per-stream decoder reset (watchdog restarts): pos := 0.

    Ring contents need no clearing — slots alias to negative logical
    positions until rewritten. mask: [B] bool, True = reset that stream.
    """
    return DecodeState(
        k_ring=state.k_ring, v_ring=state.v_ring,
        pos=jnp.where(mask, 0, state.pos),
        prev_token=jnp.where(mask, bos_token, state.prev_token),
        done=jnp.where(mask, False, state.done))


def _layer_matmuls(lp, x, cfg):
    d = cfg
    s = x.shape[0]
    q = (x @ lp["wq"]).reshape(s, d.heads, d.head_dim)
    k = (x @ lp["wk"]).reshape(s, d.kv_heads, d.head_dim)
    v = (x @ lp["wv"]).reshape(s, d.kv_heads, d.head_dim)
    return q, k, v


def decoder_prefill(dec_params: dict, cfg: VoxtralConfig, state: DecodeState,
                    embeds: jax.Array, t_ada: jax.Array,
                    n_valid: jax.Array | None = None) -> DecodeState:
    """Multi-token prefill from position 0 (always from a fresh/reset stream,
    matching the reference which zeroes the cache before prefill,
    voxtral.c:1050-1055). embeds: [B, S, D]; t_ada: [L, D] precomputed ada
    scales; n_valid: [B] (rows beyond are padding).

    Does NOT produce logits — the first sampled token comes from the first
    decode_scan step at pos = prompt_len - 1.
    """
    d = cfg.decoder
    b, s, _ = embeds.shape
    ring = state.k_ring.shape[2]
    if n_valid is None:
        n_valid = jnp.full((b,), s, jnp.int32)
    positions = jnp.arange(s, dtype=jnp.int32)
    cos, sin = rope_angles(positions, d.head_dim, d.rope_theta)

    layers = dec_params["layers"]

    def one_stream(k_rings, v_rings, emb, nv):
        valid = positions < nv
        slots = jnp.where(valid, positions % ring, nv % ring)

        def layer(l, carry):
            h, krs, vrs = carry
            lp = jax.tree.map(lambda a: a[l], layers)
            ada = t_ada[l]
            x = rms_norm(h, lp["attn_norm"], d.norm_eps)
            q, k, v = _layer_matmuls(lp, x, d)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn = windowed_attention(q, k, v, window=d.window)
            krs = krs.at[l, slots].set(k.reshape(s, d.kv_dim).astype(krs.dtype))
            vrs = vrs.at[l, slots].set(v.reshape(s, d.kv_dim).astype(vrs.dtype))
            h = h + attn.reshape(s, d.q_dim) @ lp["wo"]
            x = rms_norm(h, lp["ffn_norm"], d.norm_eps)
            x = x * (1.0 + ada.astype(x.dtype))[None, :]
            h = h + (jax.nn.silu(x @ lp["w1"]) * (x @ lp["w3"])) @ lp["w2"]
            return (h, krs, vrs)

        _, k2, v2 = jax.lax.fori_loop(
            0, d.layers, layer, (emb, k_rings, v_rings))
        return k2, v2

    k2, v2 = jax.vmap(one_stream, in_axes=(0, 0, 0, 0))(
        state.k_ring, state.v_ring, embeds.astype(cfg.compute_dtype), n_valid)
    return DecodeState(k_ring=k2, v_ring=v2, pos=n_valid.astype(jnp.int32),
                       prev_token=state.prev_token, done=state.done)


def decode_scan(dec_params: dict, cfg: VoxtralConfig, state: DecodeState,
                frames: jax.Array, n_valid: jax.Array, t_ada: jax.Array,
                *, collect_topk: int = 0, stop_at_eos: bool = True):
    """Greedy-decode up to N tokens per stream in one compiled scan.

    frames: [B, N, D] adapter outputs for positions state.pos + i
    n_valid: [B] number of real frames per stream (rest is bucket padding)
    Returns (new_state, tokens [B, N] int32 (-1 where inactive),
             aux dict with optional top-k/logit info for alt-tokens).

    Inactive steps (i >= n_valid or done) still execute but their ring writes
    land in the slot the next active step overwrites, and their token output
    is masked to -1; pos/prev_token stay frozen. This is what lets every
    stream in the batch carry a different backlog without recompilation.
    """
    d = cfg.decoder
    b, n, _ = frames.shape
    ring = state.k_ring.shape[2]
    embed = dec_params["embed"]
    eos = cfg.streaming.eos

    layers = dec_params["layers"]

    def step_one(k_rings, v_rings, pos, prev, done, frame, nv, i):
        active = jnp.logical_and(i < nv, jnp.logical_not(done)) if stop_at_eos \
            else (i < nv)
        tok_emb = embed[prev].astype(jnp.float32)
        h = (frame.astype(jnp.float32) + tok_emb)[None].astype(cfg.compute_dtype)
        cos, sin = rope_angles(pos[None], d.head_dim, d.rope_theta)
        slot = (pos % ring)[None]
        slot_pos = ring_slot_positions(pos, ring)

        # Layers are UNROLLED (static python loop): weights become static
        # slices of the stacked arrays, which XLA reads in place — a
        # fori/scan would dynamic-slice (i.e. copy) each layer's ~250 MB of
        # weights every token step, doubling HBM traffic on the hot path.
        def layer(l, h, krs, vrs):
            lp = jax.tree.map(lambda a: a[l], layers)
            ada = t_ada[l]
            x = rms_norm(h, lp["attn_norm"], d.norm_eps)
            q, k, v = _layer_matmuls(lp, x, d)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            krs = krs.at[l, slot].set(k.reshape(1, d.kv_dim).astype(krs.dtype))
            vrs = vrs.at[l, slot].set(v.reshape(1, d.kv_dim).astype(vrs.dtype))
            attn = ring_decode_attention(
                q, krs[l].reshape(ring, d.kv_heads, d.head_dim),
                vrs[l].reshape(ring, d.kv_heads, d.head_dim),
                slot_pos=slot_pos, q_pos=pos, window=d.window)
            h = h + attn.reshape(1, d.q_dim) @ lp["wo"]
            x = rms_norm(h, lp["ffn_norm"], d.norm_eps)
            x = x * (1.0 + ada.astype(x.dtype))[None, :]
            h = h + (jax.nn.silu(x @ lp["w1"]) * (x @ lp["w3"])) @ lp["w2"]
            return h, krs, vrs

        k2, v2 = k_rings, v_rings
        for l in range(d.layers):
            h, k2, v2 = layer(l, h, k2, v2)
        hn = rms_norm(h, dec_params["norm"], d.norm_eps)
        # tied-embedding logits: operands stay in param dtype with f32 MXU
        # accumulation — an explicit astype(f32) of the 131072x3072 table
        # would materialize a 1.6 GB copy per token step
        logits = jax.lax.dot_general(
            hn.astype(embed.dtype), embed,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[0]
        tok = jnp.argmax(logits).astype(jnp.int32)

        new_prev = jnp.where(active, tok, prev)
        new_pos = jnp.where(active, pos + 1, pos)
        new_done = jnp.logical_or(done, jnp.logical_and(active, tok == eos)) \
            if stop_at_eos else done
        out_tok = jnp.where(active, tok, -1)
        if collect_topk > 0:
            vals, idxs = jax.lax.top_k(logits, collect_topk)
            lse = jax.nn.logsumexp(logits)
            aux = (vals, idxs.astype(jnp.int32), lse)
        else:
            aux = ()
        return k2, v2, new_pos, new_prev, new_done, out_tok, aux

    vstep = jax.vmap(step_one, in_axes=(0, 0, 0, 0, 0, 0, 0, None))

    def scan_body(carry, xs):
        kr, vr, pos, prev, done = carry
        frame_i, i = xs
        kr, vr, pos, prev, done, tok, aux = vstep(
            kr, vr, pos, prev, done, frame_i, n_valid, i)
        return (kr, vr, pos, prev, done), (tok, aux)

    frames_t = jnp.swapaxes(frames, 0, 1)          # [N, B, D]
    carry = (state.k_ring, state.v_ring, state.pos, state.prev_token, state.done)
    carry, (tokens, aux) = jax.lax.scan(
        scan_body, carry, (frames_t, jnp.arange(n, dtype=jnp.int32)))
    kr, vr, pos, prev, done = carry
    new_state = DecodeState(k_ring=kr, v_ring=vr, pos=pos, prev_token=prev,
                            done=done)
    tokens = jnp.swapaxes(tokens, 0, 1)            # [B, N]
    aux_out = {}
    if collect_topk > 0:
        vals, idxs, lse = aux
        aux_out = {"topk_vals": jnp.swapaxes(vals, 0, 1),
                   "topk_idx": jnp.swapaxes(idxs, 0, 1),
                   "logsumexp": jnp.swapaxes(lse, 0, 1)}
    return new_state, tokens, aux_out
