"""Sliding-window causal GQA attention (XLA reference implementations).

Two entry points:

- `windowed_attention`: full [S, Skv] score matrix with a causal+window mask.
  Used by the batch encoder/decoder-prefill paths where S is the whole
  (padded) sequence. Mask semantics match the reference exactly: key at
  absolute position kj is visible from query at absolute position qi iff
  kj <= qi and kj >= qi - (window - 1)
  (python_simple_implementation.py:281-318, voxtral_kernels.c:541-611).

- `ring_decode_attention`: queries against a fixed-shape circular KV buffer
  holding the last `ring_size` positions. This is the TPU-native replacement
  for the reference's memmove cache compaction (voxtral_decoder.c:354-384):
  instead of shifting memory, slots are addressed `pos % ring` and masked by
  logical position, so the decode step compiles once for unlimited audio.

Softmax statistics are f32 with max-subtraction, matching the reference's
online-softmax numerics. Pallas-fused variants live in pallas_attention.py;
these XLA versions are the correctness oracle they are tested against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def _gqa_scores(q: jax.Array, k: jax.Array) -> jax.Array:
    """q: [S, H, hd], k: [Skv, Hkv, hd] -> scores [H, S, Skv] (f32).

    Low-precision operands go to the dot DIRECTLY with f32 accumulation —
    numerically identical to casting them to f32 first (the cast is exact
    and the MXU accumulates in f32), but an explicit astype of the KV ring
    would materialize a multi-GB f32 copy per decode step."""
    s, h, hd = q.shape
    skv, hkv, _ = k.shape
    group = h // hkv
    qg = q.reshape(s, hkv, group, hd)
    scores = jnp.einsum("sngd,tnd->ngst", qg, k.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    return scores.reshape(h, s, skv)


def _gqa_output(probs: jax.Array, v: jax.Array, out_dtype) -> jax.Array:
    """probs: [H, S, Skv] f32, v: [Skv, Hkv, hd] -> [S, H, hd].

    When V is low-precision, probs are cast DOWN to V's dtype for the MXU
    pass (instead of casting the ring up to f32, which would materialize
    it); accumulation stays f32. In f32 parity mode nothing is cast."""
    h, s, skv = probs.shape
    _, hkv, hd = v.shape
    group = h // hkv
    p = probs.reshape(hkv, group, s, skv).astype(v.dtype)
    out = jnp.einsum("ngst,tnd->sngd", p, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(s, h, hd).astype(out_dtype)


def _masked_softmax(scores: jax.Array, mask: jax.Array) -> jax.Array:
    """scores: [H, S, Skv] f32; mask: [S, Skv] bool (True = attend)."""
    scores = jnp.where(mask[None, :, :], scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    # Guard fully-masked rows (cannot happen for valid schedules, but keeps NaNs out)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(scores - m)
    e = jnp.where(mask[None, :, :], e, 0.0)
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)


def windowed_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                       window: int, q_start=0, kv_start=0) -> jax.Array:
    """Materialized-mask sliding-window causal attention.

    q: [S, H, hd] at absolute positions q_start + i
    k, v: [Skv, Hkv, hd] at absolute positions kv_start + j
    Returns [S, H, hd] in q.dtype.
    """
    s, h, hd = q.shape
    skv = k.shape[0]
    scale = 1.0 / (hd ** 0.5)
    scores = _gqa_scores(q, k) * scale
    qi = q_start + jnp.arange(s)[:, None]
    kj = kv_start + jnp.arange(skv)[None, :]
    mask = (kj <= qi) & (kj >= qi - (window - 1))
    probs = _masked_softmax(scores, mask)
    return _gqa_output(probs, v, q.dtype)


def ring_slot_positions(last_pos: jax.Array, ring_size: int) -> jax.Array:
    """Logical position held by each ring slot, given the most recent position.

    Slot j (j = pos % ring_size addressing) holds the largest position <=
    last_pos congruent to j mod ring_size; negative means never written.
    Returns int32 [ring_size].
    """
    j = jnp.arange(ring_size, dtype=jnp.int32)
    lp = last_pos.astype(jnp.int32) if hasattr(last_pos, "astype") else jnp.int32(last_pos)
    return lp - jnp.mod(lp - j, ring_size)


def ring_decode_attention(q: jax.Array, k_ring: jax.Array, v_ring: jax.Array, *,
                          slot_pos: jax.Array, q_pos: jax.Array,
                          window: int, extra_kv=None) -> jax.Array:
    """Attention for S queries against a circular KV buffer.

    q: [S, H, hd] at absolute positions given by q_pos ([S] int or scalar
       when S == 1); k_ring/v_ring: [R, Hkv, hd]; slot_pos: [R] logical
       positions per slot (negative = invalid). Requires R >= window so the
       ring always covers the full attention window.

    extra_kv: optional ([Sx, Hkv, hd], [Sx, Hkv, hd], kv_pos [Sx] int32)
    of additional K/V columns at logical positions kv_pos (negative =
    invalid), masked causally like ring slots. Used by the decode scan for
    the current chunk's accumulated KV, which is kept out of the ring until
    the scan finishes (the ring stays loop-invariant, see decoder.py).
    """
    if q.ndim == 2:
        q = q[None]
    s = q.shape[0]
    q_pos = jnp.asarray(q_pos, dtype=jnp.int32).reshape(-1)
    if q_pos.shape[0] == 1 and s > 1:
        q_pos = q_pos[0] + jnp.arange(s, dtype=jnp.int32)
    qi = q_pos[:, None]                              # [S, 1]
    kj = slot_pos[None, :]                           # [1, R]
    mask = (kj >= 0) & (kj <= qi) & (kj >= qi - (window - 1))
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = _gqa_scores(q, k_ring) * scale          # [H, S, R]
    if extra_kv is None:
        probs = _masked_softmax(scores, mask)
        return _gqa_output(probs, v_ring, q.dtype)
    # Append the extra K/V as additional columns by concatenating SCORES
    # (tiny) rather than KV — a KV concat would copy the whole ring slice
    # every layer/step.
    xk, xv, x_pos = extra_kv
    scores_x = _gqa_scores(q, xk) * scale            # [H, S, Sx]
    kj_x = x_pos[None, :]                            # [1, Sx]
    mask_x = (kj_x >= 0) & (kj_x <= qi) & (kj_x >= qi - (window - 1))
    probs = _masked_softmax(jnp.concatenate([scores, scores_x], axis=-1),
                            jnp.concatenate([mask, mask_x], axis=-1))
    r = k_ring.shape[0]
    out = _gqa_output(probs[:, :, :r], v_ring, jnp.float32)
    out_x = _gqa_output(probs[:, :, r:], xv, jnp.float32)
    return (out + out_x).astype(q.dtype)
