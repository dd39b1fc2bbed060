"""Ministral-3 text decoder with fixed-shape circular KV cache and
scan-based multi-token greedy decode.

Reference semantics: voxtral_decoder.c:447-780 and
python_simple_implementation.py:469-664. GQA 32Q/8KV x 128, SwiGLU 9216,
no biases, interleaved RoPE theta=1e6, sliding window 8192, tied embeddings
(logits = h @ embed.T in f32), per-layer ada_rms_norm time conditioning
applied after ffn_norm: h_norm * (1 + ada_scale).

TPU redesign vs the reference — four rules shape this file, all learned
empirically from XLA TPU buffer-assignment/scheduling behavior on v5e:

1. PER-LAYER BUFFERS, never stacked-and-sliced. A dot (or attention read)
   cannot consume a slice of a bigger parameter in place — XLA materializes
   a copy of the slice, per scan iteration. This applies to stacked
   [L, ...] weights AND to a monolithic [B, L, R, K] KV cache (measured:
   ring slices re-copied every decode step, ~3.7 ms/token at B=8). Weights
   and KV rings are therefore TUPLES of per-layer arrays.

2. LOCKSTEP ring cursor. The grow/memmove KV cache
   (voxtral_decoder.c:251-384) becomes circular buffers [B, W, Hkv*hd]
   whose write slots are assigned by ONE cursor shared by all streams, with
   a per-stream [B, W] table mapping slots to logical positions (attention
   masks by logical position). Per-stream `pos % W` writes would be a
   batched scatter, which XLA cannot keep in place (full ring copy).

3. RINGS ARE NEVER READ BEFORE BEING WRITTEN inside one program. A chunk's
   KV is accumulated in small per-layer [B, N, K] buffers during the decode
   scan (attention sees ring + chunk-so-far as extra masked columns) and
   parked in the state as a PENDING block; the NEXT call folds it into the
   rings FIRST — one dynamic_update_slice per ring before any ring read.
   Writing the rings at the END of a program (after the scan read them)
   makes the TPU scheduler double-buffer them (+GiBs and ring-sized
   copies).

4. The fold never wraps: the physical ring carries an Np-slot OVERFLOW
   margin (P = R + Np; writes land at ctr % R), and R >= window + Np keeps
   every stomped slot out-of-window, so sliding-window semantics stay
   exact. Overflow slots are ordinary readable slots — each holds a
   distinct position, masked by slot_pos like any other.

The reference pays one device sync per token (voxtral_metal.m:2888-3174);
here a whole backlog of adapter frames decodes in ONE lax.scan dispatch
(greedy feedback carried on device), with bucket padding + n_valid masking
so streaming intervals never recompile. All state is batched over a leading
stream axis: concurrent streams share each weight read, which is what makes
a bandwidth-bound 4B decoder scale past real-time on one chip.

Lockstep caveat: the shared cursor advances by the longest active prefix
over the batch, so a stream that idles (EOS / shorter backlog) while
siblings decode has its slots recycled sooner — its effective window
shrinks by its lag fraction. The fleet contract (equal backlogs) and B=1
streaming are exact.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.ops import apply_rope, rms_norm, rope_angles
from voxtral_tpu.ops.attention import windowed_attention
from voxtral_tpu.ops.linear import embed_logits, embed_lookup, linear
from voxtral_tpu.ops.pallas_attention import ring_attention
from voxtral_tpu.quant import Quantized, dequantize, quantize_kv

SLOT_INVALID = -(1 << 30)

# Decode-scan unroll factor (trace-time): unrolling lets the TPU scheduler
# overlap one token's tail (logits/argmax/embed reads) with the next
# token's early layer-weight DMA across the iteration boundary. Perf knob
# only — results are bit-identical. Default 4: measured +2% fleet step at
# the 4B bf16+int8KV config (tools/profile_unroll.py, SPEED.md); compile
# memory grows with it (B=26 at 4B shapes fails to compile at unroll 4).
_SCAN_UNROLL = int(os.environ.get("VOX_SCAN_UNROLL", "4"))


def alt_candidates(logits: jax.Array, tok: jax.Array, n_special: int,
                   k: int):
    """Alt-token candidates with EXACT full-vocab-scan semantics
    (voxtral.c:955-1010): the reference softmaxes the whole vocab and
    repeatedly scans i >= TOKEN_TEXT_MIN (= n_special, specials excluded),
    skipping the emitted best token, picking candidates in descending
    probability. Probability order equals logit order and
    p_i / p_best == exp(l_i - l_best), so the softmax cancels: top-k over
    the masked logits gives the same candidate sequence (ties broken by
    lowest index, like the reference's strict `>` scan).

    logits: [B, V] f32; tok: [B] emitted token. Returns (vals [B, k] f32
    masked logits (-inf once candidates run out), idx [B, k] int32,
    best_logit [B] f32 = logits[tok])."""
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    masked = jnp.where((iota < n_special) | (iota == tok[:, None]),
                       -jnp.inf, logits)
    vals, idxs = jax.lax.top_k(masked, k)
    best = jnp.take_along_axis(logits, tok[:, None].astype(jnp.int32),
                               axis=1)[:, 0]
    return vals, idxs.astype(jnp.int32), best


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
    tc = t_cond.astype(jnp.float32)

    def f32w(w):
        return dequantize(w) if isinstance(w, Quantized) \
            else w.astype(jnp.float32)

    rows = [jax.nn.gelu(tc @ f32w(lp["ada_down"]), approximate=False)
            @ f32w(lp["ada_up"])
            for lp in dec_params["layers"]]
    return jnp.stack(rows)


class DecodeState(NamedTuple):
    """Batched decoder stream state (leading axis B = concurrent streams).

    k_ring/v_ring: tuples of L per-layer [B, P, Hkv*hd] circular buffers
    (rule 1; P = R + Np, rule 4). KV heads are MERGED into the last axis —
    a [..., 8, 128] bf16 layout would be padded on the 8-sublane axis; the
    merged 1024-wide axis is layout-clean. Attention reshapes to
    [P, Hkv, hd].

    pending_*: the most recent chunk's KV, not yet folded into the rings
    (rule 3). write_ctr is the ring slot where pending column 0 lands;
    pending_adv is how far the cursor advances after the fold (the chunk's
    longest active prefix).

    kv_dtype="int8" mode: rings are int8 with per-(slot, head) f32 scale
    tables (k_scale/v_scale, None in float mode); pending blocks stay float
    and are quantized at fold time (quant.py:quantize_kv). The fused
    attention kernel applies scales to score/probability columns — ring
    HBM traffic and footprint halve, which is what lets the stream batch
    double on a 16 GB chip."""
    k_ring: tuple          # L x [B, P, Hkv*hd]
    v_ring: tuple          # L x [B, P, Hkv*hd]
    k_scale: tuple | None  # L x [B, Hkv, P] f32 (int8 mode only)
    v_scale: tuple | None
    slot_pos: jax.Array    # [B, P] int32 logical position per slot
    pending_k: tuple       # L x [B, Np, Hkv*hd]
    pending_v: tuple       # L x [B, Np, Hkv*hd]
    pending_sp: jax.Array  # [B, Np] int32 (SLOT_INVALID = empty column)
    pending_adv: jax.Array  # [] int32
    write_ctr: jax.Array   # [] int32
    pos: jax.Array         # [B] int32 next decode position
    prev_token: jax.Array  # [B] int32
    done: jax.Array        # [B] bool (EOS seen)


def init_decode_state(cfg: VoxtralConfig, batch: int = 1, dtype=None,
                      ring_size: int | None = None,
                      pending_size: int = 64,
                      kv_dtype: str = "float") -> DecodeState:
    """ring_size (the cursor modulus R) defaults to window + pending_size so
    pending folds can never clobber an in-window slot (rule 4)."""
    d = cfg.decoder
    dt = dtype or cfg.compute_dtype
    # int4 is ENCODER-only (per-token decoder unpack measured slower than
    # the DMA it saves — SPEED.md int4 rejection); silently falling through
    # to float here would double the intended ring HBM and desync the
    # sharding pspecs' tree structure.
    assert kv_dtype in ("float", "int8"), \
        f"decoder kv_dtype must be 'float' or 'int8', got {kv_dtype!r} " \
        "(int4 rings are encoder-only: pass enc_kv_dtype='int4')"
    ring = ring_size or (d.window + pending_size)
    assert pending_size <= ring
    # 32-row-aligned physical slot axis (int8 tile height; see encoder.py)
    phys = ring + pending_size
    if phys % 32:
        ring += 32 - phys % 32
        phys = ring + pending_size
    int8 = kv_dtype == "int8"
    ring_dt = jnp.int8 if int8 else dt
    return DecodeState(
        k_ring=tuple(jnp.zeros((batch, phys, d.kv_dim), ring_dt)
                     for _ in range(d.layers)),
        v_ring=tuple(jnp.zeros((batch, phys, d.kv_dim), ring_dt)
                     for _ in range(d.layers)),
        k_scale=tuple(jnp.ones((batch, d.kv_heads, phys), jnp.float32)
                      for _ in range(d.layers)) if int8 else None,
        v_scale=tuple(jnp.ones((batch, d.kv_heads, phys), jnp.float32)
                      for _ in range(d.layers)) if int8 else None,
        slot_pos=jnp.full((batch, phys), SLOT_INVALID, jnp.int32),
        pending_k=tuple(jnp.zeros((batch, pending_size, d.kv_dim), dt)
                        for _ in range(d.layers)),
        pending_v=tuple(jnp.zeros((batch, pending_size, d.kv_dim), dt)
                        for _ in range(d.layers)),
        pending_sp=jnp.full((batch, pending_size), SLOT_INVALID, jnp.int32),
        pending_adv=jnp.zeros((), jnp.int32),
        write_ctr=jnp.zeros((), jnp.int32),
        pos=jnp.zeros((batch,), jnp.int32),
        prev_token=jnp.full((batch,), 1, jnp.int32),   # BOS
        done=jnp.zeros((batch,), bool),
    )


def reset_streams(state: DecodeState, mask: jax.Array, bos_token: int = 1,
                  reset_write_ctr: bool = False) -> DecodeState:
    """Host-driven per-stream decoder reset (watchdog restarts): pos := 0 and
    the slot tables invalidated — ring contents need no clearing.

    mask: [B] bool, True = reset that stream. reset_write_ctr: only valid
    when every stream resets (B=1 streaming); a reset stream inside a live
    fleet keeps the shared cursor and re-prefills via forced-token decode
    steps (decode_scan forced_tokens).
    """
    zero = jnp.zeros((), jnp.int32)
    return state._replace(
        slot_pos=jnp.where(mask[:, None], SLOT_INVALID, state.slot_pos),
        pending_sp=jnp.where(mask[:, None], SLOT_INVALID, state.pending_sp),
        pending_adv=zero if reset_write_ctr else state.pending_adv,
        write_ctr=zero if reset_write_ctr else state.write_ctr,
        pos=jnp.where(mask, 0, state.pos),
        prev_token=jnp.where(mask, bos_token, state.prev_token),
        done=jnp.where(mask, False, state.done))


def retained_window(state: DecodeState, window: int):
    """Per-stream count of in-window KV entries actually present (ring +
    pending): the CHECKABLE form of the lockstep-lag caveat (module
    docstring). A stream advancing every step retains
    min(pos, window, ring); a stream that idles while siblings decode has
    its oldest slots recycled by the shared cursor and this count shrinks
    below its nominal window — the quantity the 2000-KV watchdog restart
    bounds. Returns [B] int32. (The reference keeps a per-stream cache,
    voxtral_decoder.c:251-384, where this is always min(pos, window);
    tests/test_manager.py pins both the exact-within-bound and the
    measured-shrink behaviors.)"""
    lo = state.pos[:, None] - window
    hi = state.pos[:, None]

    def count(sp):
        return ((sp >= lo) & (sp < hi)).sum(axis=1)

    return (count(state.slot_pos)
            + count(state.pending_sp)).astype(jnp.int32)


def _fold_pending(state: DecodeState, kv_heads: int, head_dim: int):
    """Fold the pending chunk into the rings — ONE in-place
    dynamic_update_slice per ring buffer, issued BEFORE any ring read
    (rule 3), at ctr % R (the overflow margin guarantees no wrap, rule 4).
    Int8 rings: the float pending is quantized here; scales land in the
    scale tables at the same slots. Returns (k_rings, v_rings, k_scales,
    v_scales, slot_pos, base) with base = cursor for the next chunk."""
    np_ = state.pending_sp.shape[1]
    ring = state.k_ring[0].shape[1] - np_
    slot = state.write_ctr % ring
    int8 = state.k_scale is not None

    def fold(ring_t, pend_t, scale_t):
        if not int8:
            return tuple(jax.lax.dynamic_update_slice(r, p, (0, slot, 0))
                         for r, p in zip(ring_t, pend_t)), None
        rings, scales = [], []
        for r, p, sc in zip(ring_t, pend_t, scale_t):
            qv, qs = quantize_kv(p, kv_heads, head_dim)
            rings.append(jax.lax.dynamic_update_slice(r, qv, (0, slot, 0)))
            scales.append(jax.lax.dynamic_update_slice(sc, qs, (0, 0, slot)))
        return tuple(rings), tuple(scales)

    krs, kss = fold(state.k_ring, state.pending_k, state.k_scale)
    vrs, vss = fold(state.v_ring, state.pending_v, state.v_scale)
    sp = jax.lax.dynamic_update_slice(
        state.slot_pos, state.pending_sp, (0, slot))
    return krs, vrs, kss, vss, sp, state.write_ctr + state.pending_adv


def _layer_matmuls(lp, x, cfg):
    d = cfg
    s = x.shape[0]
    q = linear(x, lp["wq"]).reshape(s, d.heads, d.head_dim)
    k = linear(x, lp["wk"]).reshape(s, d.kv_heads, d.head_dim)
    v = linear(x, lp["wv"]).reshape(s, d.kv_heads, d.head_dim)
    return q, k, v


def decoder_prefill(dec_params: dict, cfg: VoxtralConfig, state: DecodeState,
                    embeds: jax.Array, t_ada: jax.Array,
                    n_valid: jax.Array | None = None) -> DecodeState:
    """Multi-token prefill from position 0 on a FRESH/reset state
    (write_ctr == 0; the reference likewise zeroes the cache before prefill,
    voxtral.c:1050-1055). embeds: [B, S, D]; t_ada: [L, D] precomputed ada
    scales; n_valid: [B] (rows beyond are padding).

    Does NOT produce logits — the first sampled token comes from the first
    decode_scan step at pos = prompt_len - 1. Prefill writes the rings
    directly (it never reads them), and leaves an empty pending block.
    """
    d = cfg.decoder
    b, s, _ = embeds.shape
    n_valid_given = n_valid is not None
    if n_valid is None:
        n_valid = jnp.full((b,), s, jnp.int32)
    positions = jnp.arange(s, dtype=jnp.int32)
    cos, sin = rope_angles(positions, d.head_dim, d.rope_theta)

    def one_stream(emb):
        """[S, D] -> per-layer (k, v) [S, Hkv*hd] lists; attention is over
        the prefix itself (fresh cache), so ring reads are not needed."""
        h = emb
        ks, vs = [], []
        for l, lp in enumerate(dec_params["layers"]):
            x = rms_norm(h, lp["attn_norm"], d.norm_eps)
            q, k, v = _layer_matmuls(lp, x, d)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn = windowed_attention(q, k, v, window=d.window)
            h = h + linear(attn.reshape(s, d.q_dim), lp["wo"])
            x = rms_norm(h, lp["ffn_norm"], d.norm_eps)
            x = x * (1.0 + t_ada[l].astype(x.dtype))[None, :]
            h = h + linear(jax.nn.silu(linear(x, lp["w1"]))
                           * linear(x, lp["w3"]), lp["w2"])
            ks.append(k.reshape(s, d.kv_dim))
            vs.append(v.reshape(s, d.kv_dim))
        return tuple(ks), tuple(vs)

    k_all, v_all = jax.vmap(one_stream)(embeds.astype(cfg.compute_dtype))
    row_pos = jnp.where(positions[None, :] < n_valid[:, None],
                        positions[None, :], SLOT_INVALID).astype(jnp.int32)
    np_ = state.pending_sp.shape[1]
    ring = state.k_ring[0].shape[1] - np_   # logical ring (cursor modulus)
    if s > ring and n_valid_given:
        # the eviction below keeps the last `ring` ROWS; with bucket padding
        # (n_valid < s) those could be invalid rows while valid in-window
        # positions get dropped — unsupported, fail loud
        raise ValueError(
            f"prefill longer than the ring ({s} > {ring}) cannot carry "
            "per-stream n_valid padding")
    if s > ring:
        # Only the last `ring` positions survive; slot j holds position
        # p ≡ j (mod ring), i.e. the kept rows rolled by the static s % ring.
        shift = s % ring
        k_all = tuple(jnp.roll(k[:, s - ring:, :], shift, axis=1)
                      for k in k_all)
        v_all = tuple(jnp.roll(v[:, s - ring:, :], shift, axis=1)
                      for v in v_all)
        row_pos = jnp.roll(row_pos[:, s - ring:], shift, axis=1)

    # One contiguous static-offset write per ring: slots 0..min(S, ring)-1.
    def write(ring_t, vals_t, scale_t):
        if state.k_scale is None:
            return tuple(
                jax.lax.dynamic_update_slice(r, x.astype(r.dtype), (0, 0, 0))
                for r, x in zip(ring_t, vals_t)), None
        rings, scales = [], []
        for r, x, sc in zip(ring_t, vals_t, scale_t):
            qv, qs = quantize_kv(x, d.kv_heads, d.head_dim)
            rings.append(jax.lax.dynamic_update_slice(r, qv, (0, 0, 0)))
            scales.append(jax.lax.dynamic_update_slice(sc, qs, (0, 0, 0)))
        return tuple(rings), tuple(scales)

    k2, ks2 = write(state.k_ring, k_all, state.k_scale)
    v2, vs2 = write(state.v_ring, v_all, state.v_scale)
    slot_pos = jax.lax.dynamic_update_slice(state.slot_pos, row_pos, (0, 0))
    return state._replace(
        k_ring=k2, v_ring=v2, k_scale=ks2, v_scale=vs2, slot_pos=slot_pos,
        pending_sp=jnp.full_like(state.pending_sp, SLOT_INVALID),
        pending_adv=jnp.zeros((), jnp.int32),
        write_ctr=jnp.int32(s),
        pos=n_valid.astype(jnp.int32))


def decode_scan(dec_params: dict, cfg: VoxtralConfig, state: DecodeState,
                frames: jax.Array, n_valid: jax.Array, t_ada: jax.Array,
                *, collect_topk: int = 0, stop_at_eos: bool = True,
                forced_tokens: jax.Array | None = None):
    """Greedy-decode up to N tokens per stream in one compiled scan.

    frames: [B, N, D] adapter outputs for positions state.pos + i
    n_valid: [B] number of real frames per stream (rest is bucket padding)
    forced_tokens: optional [B, N] int32; entries >= 0 override the greedy
    choice as the feedback/emitted token (used for batched prompt-replay
    after a per-stream watchdog restart inside a live fleet).
    Returns (new_state, tokens [B, N] int32 (-1 where inactive),
             aux dict with optional top-k/logit info for alt-tokens).

    Inactive steps (i >= n_valid or done) contribute SLOT_INVALID pending
    columns and their token output is masked to -1; pos/prev_token stay
    frozen. This is what lets every stream in the batch carry a different
    backlog without recompilation.
    """
    d = cfg.decoder
    b, n, _ = frames.shape
    np_ = state.pending_sp.shape[1]
    if n > np_:
        # A chunk larger than the pending block decodes as sequential
        # segments; production chunks are << pending.
        toks, auxes = [], []
        for s0 in range(0, n, np_):
            s1 = min(s0 + np_, n)
            seg_nv = jnp.clip(n_valid - s0, 0, s1 - s0)
            seg_forced = None if forced_tokens is None \
                else forced_tokens[:, s0:s1]
            state, t, a = decode_scan(
                dec_params, cfg, state, frames[:, s0:s1], seg_nv, t_ada,
                collect_topk=collect_topk, stop_at_eos=stop_at_eos,
                forced_tokens=seg_forced)
            toks.append(t)
            auxes.append(a)
        aux_out = {k: jnp.concatenate([a[k] for a in auxes], axis=1)
                   for k in auxes[0]}
        return state, jnp.concatenate(toks, axis=1), aux_out

    embed = dec_params["embed"]
    eos = cfg.streaming.eos
    layer_list = dec_params["layers"]

    # Rule 3: fold the previous chunk's KV into the rings BEFORE any ring
    # read, then treat the rings as loop-invariant.
    k_rings, v_rings, k_ss, v_ss, ring_sp, base = _fold_pending(
        state, d.kv_heads, d.head_dim)
    # Slots touched so far form a prefix: pre-wrap the latest fold ends at
    # write_ctr % ring + Np == write_ctr + Np; post-wrap everything. The
    # attention kernel skips the untouched tail's DMA entirely (scan-
    # invariant: rings are loop-invariant inside the scan).
    phys = state.slot_pos.shape[1]
    nv_slots = jnp.minimum(state.write_ctr + np_, phys)

    def scan_body(carry, xs):
        """Fully batched token step: every op carries the stream axis B, so
        each layer is ONE fused attention kernel + a handful of batched
        matmuls (the per-stream vmap formulation compiled to thousands of
        small ops; see git history)."""
        chunk_k, chunk_v, chunk_pos, pos, prev, done = carry
        if forced_tokens is None:
            frame_i, i = xs
            forced_i = None
        else:
            frame_i, forced_i, i = xs
        active = (i < n_valid) & ~done if stop_at_eos else (i < n_valid)
        tok_emb = embed_lookup(embed, prev)                       # [B, D]
        h = ((frame_i.astype(jnp.float32) + tok_emb)[:, None, :]
             .astype(cfg.compute_dtype))                          # [B, 1, D]
        cos, sin = rope_angles(pos[:, None], d.head_dim, d.rope_theta)
        chunk_pos = chunk_pos.at[:, i].set(
            jnp.where(active, pos, SLOT_INVALID))

        chunk_k = list(chunk_k)
        chunk_v = list(chunk_v)
        for l in range(d.layers):
            lp = layer_list[l]
            x = rms_norm(h, lp["attn_norm"], d.norm_eps)
            q = linear(x, lp["wq"]).reshape(b, 1, d.heads, d.head_dim)
            k = linear(x, lp["wk"]).reshape(b, 1, d.kv_heads, d.head_dim)
            v = linear(x, lp["wv"]).reshape(b, 1, d.kv_heads, d.head_dim)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            ck = chunk_k[l].at[:, i].set(
                k.reshape(b, d.kv_dim).astype(chunk_k[l].dtype))
            cv = chunk_v[l].at[:, i].set(
                v.reshape(b, d.kv_dim).astype(chunk_v[l].dtype))
            chunk_k[l], chunk_v[l] = ck, cv
            attn = ring_attention(
                q.reshape(b, 1, d.q_dim), k_rings[l], v_rings[l], ring_sp,
                pos[:, None], window=d.window, heads=d.heads,
                kv_heads=d.kv_heads, head_dim=d.head_dim,
                k_scale=None if k_ss is None else k_ss[l],
                v_scale=None if v_ss is None else v_ss[l],
                extra_kv=(ck, cv, chunk_pos),
                n_valid_slots=nv_slots)                           # [B, 1, Qd]
            h = h + linear(attn, lp["wo"])
            x = rms_norm(h, lp["ffn_norm"], d.norm_eps)
            x = x * (1.0 + t_ada[l].astype(x.dtype))[None, None, :]
            h = h + linear(jax.nn.silu(linear(x, lp["w1"]))
                           * linear(x, lp["w3"]), lp["w2"])

        hn = rms_norm(h[:, 0], dec_params["norm"], d.norm_eps)
        logits = embed_logits(hn, embed)                          # [B, V]
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if forced_i is not None:
            tok = jnp.where(forced_i >= 0, forced_i, tok)

        new_prev = jnp.where(active, tok, prev)
        new_pos = jnp.where(active, pos + 1, pos)
        new_done = done | (active & (tok == eos)) if stop_at_eos else done
        out_tok = jnp.where(active, tok, -1)
        if collect_topk > 0:
            aux = alt_candidates(logits, tok, cfg.streaming.n_special,
                                 collect_topk)
        else:
            aux = ()
        return ((tuple(chunk_k), tuple(chunk_v), chunk_pos,
                 new_pos, new_prev, new_done), (out_tok, aux))

    frames_t = jnp.swapaxes(frames, 0, 1)          # [N, B, D]
    steps = jnp.arange(n, dtype=jnp.int32)
    if forced_tokens is None:
        xs = (frames_t, steps)
    else:
        xs = (frames_t, jnp.swapaxes(forced_tokens, 0, 1), steps)
    rdt = state.pending_k[0].dtype                 # chunk KV stays float
    carry = (tuple(jnp.zeros((b, n, d.kv_dim), rdt) for _ in range(d.layers)),
             tuple(jnp.zeros((b, n, d.kv_dim), rdt) for _ in range(d.layers)),
             jnp.full((b, n), SLOT_INVALID, jnp.int32),
             state.pos, state.prev_token, state.done)
    carry, (tokens, aux) = jax.lax.scan(scan_body, carry, xs,
                                        unroll=_SCAN_UNROLL)
    chunk_k, chunk_v, chunk_pos, pos, prev, done = carry

    # Park this chunk as the new pending block (padded to Np). Cursor
    # advances by the longest ACTIVE prefix, not the padded chunk length:
    # trailing all-inactive columns are re-written by the next chunk, so a
    # B=1 stream never lags its cursor (zero burn).
    if n < np_:
        pk = tuple(jax.lax.dynamic_update_slice(jnp.zeros_like(p), c, (0, 0, 0))
                   for p, c in zip(state.pending_k, chunk_k))
        pv = tuple(jax.lax.dynamic_update_slice(jnp.zeros_like(p), c, (0, 0, 0))
                   for p, c in zip(state.pending_v, chunk_v))
        psp = jax.lax.dynamic_update_slice(
            jnp.full_like(state.pending_sp, SLOT_INVALID), chunk_pos, (0, 0))
    else:
        pk, pv, psp = chunk_k, chunk_v, chunk_pos
    n_act = jnp.max(jnp.minimum(n_valid, n)).astype(jnp.int32)
    new_state = state._replace(
        k_ring=k_rings, v_ring=v_rings, k_scale=k_ss, v_scale=v_ss,
        slot_pos=ring_sp,
        pending_k=pk, pending_v=pv, pending_sp=psp,
        pending_adv=n_act, write_ctr=base,
        pos=pos, prev_token=prev, done=done)
    tokens = jnp.swapaxes(tokens, 0, 1)            # [B, N]
    aux_out = {}
    if collect_topk > 0:
        vals, idxs, best = aux
        vals = jnp.swapaxes(vals, 0, 1)            # [B, N, k]
        idxs = jnp.swapaxes(idxs, 0, 1)
        best = jnp.swapaxes(best, 0, 1)            # [B, N]
        aux_out = {"topk_vals": vals, "topk_idx": idxs, "best_logit": best}
        # One-transfer wire form: on a high-fixed-cost link every
        # device->host read costs ~25 ms regardless of size (SPEED.md
        # serving-latency breakdown), so callers fetch THIS single array
        # instead of tokens + 3 aux reads. int32 columns ride as f32 bit
        # patterns (bitcast, exact).
        f = jnp.float32
        aux_out["packed"] = jnp.concatenate([
            jax.lax.bitcast_convert_type(tokens, f)[:, :, None],
            best[:, :, None].astype(f),
            vals.astype(f),
            jax.lax.bitcast_convert_type(idxs, f),
        ], axis=-1)                                # [B, N, 2k+2]
    return new_state, tokens, aux_out
