"""Fused Pallas ring-GQA attention vs the XLA oracle (ops/attention.py).

Runs the kernel in interpreter mode on CPU; the same code compiles on TPU
(exercised by bench.py and the on-device verify drive)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxtral_tpu.ops.attention import ring_decode_attention
from voxtral_tpu.ops.pallas_attention import ring_gqa_attention

SLOT_INVALID = -(1 << 30)


def _mk_ring(rng, b, p, hkv, hd, last_pos, dtype=jnp.float32):
    k = jnp.asarray(rng.randn(b, p, hkv * hd).astype(np.float32) * 0.3, dtype)
    v = jnp.asarray(rng.randn(b, p, hkv * hd).astype(np.float32) * 0.3, dtype)
    # slot j holds the largest position <= last_pos congruent j (mod p);
    # positions > last_pos never written -> invalid
    j = np.arange(p)
    sp = last_pos - np.mod(last_pos - j, p)
    sp = np.where(sp < 0, SLOT_INVALID, sp)
    return k, v, jnp.asarray(np.broadcast_to(sp, (b, p)), jnp.int32)


def _oracle(q, k, v, sp, q_pos, window, hkv, hd, extra=None):
    """Vmapped XLA reference over the batch."""
    b, s, qd = q.shape
    h = qd // hd

    def one(qb, kb, vb, spb, qpb, ex):
        out = ring_decode_attention(
            qb.reshape(s, h, hd), kb.reshape(-1, hkv, hd),
            vb.reshape(-1, hkv, hd), slot_pos=spb, q_pos=qpb, window=window,
            extra_kv=None if ex is None else
            (ex[0].reshape(-1, hkv, hd), ex[1].reshape(-1, hkv, hd), ex[2]))
        return out.reshape(s, qd)

    if extra is None:
        return jax.vmap(lambda a, b_, c, d, e: one(a, b_, c, d, e, None))(
            q, k, v, sp, q_pos)
    return jax.vmap(lambda a, b_, c, d, e, x0, x1, x2:
                    one(a, b_, c, d, e, (x0, x1, x2)))(
        q, k, v, sp, q_pos, *extra)


@pytest.mark.parametrize("case", ["decode_gqa", "encoder_mha"])
@pytest.mark.parametrize("wrap", [False, True])
def test_kernel_matches_oracle(case, wrap):
    rng = np.random.RandomState(42)
    if case == "decode_gqa":
        b, s, h, hkv, hd, p, window = 3, 1, 8, 2, 128, 96, 48
    else:
        b, s, h, hkv, hd, p, window = 2, 16, 4, 4, 64, 96, 48
    last = 200 if wrap else 40   # wrapped ring vs partially-filled ring
    k, v, sp = _mk_ring(rng, b, p, hkv, hd, last)
    q = jnp.asarray(rng.randn(b, s, h * hd).astype(np.float32) * 0.3)
    q_pos = jnp.asarray(
        np.stack([np.arange(s) + last + 1 + i for i in range(b)]), jnp.int32)

    out = ring_gqa_attention(q, k, v, sp, q_pos, window=window, heads=h,
                             kv_heads=hkv, head_dim=hd, interpret=True)
    ref = _oracle(q, k, v, sp, q_pos, window, hkv, hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("case", ["decode_gqa", "encoder_mha"])
def test_kernel_with_extra_kv(case):
    rng = np.random.RandomState(7)
    if case == "decode_gqa":
        b, s, h, hkv, hd, p, window, sx = 2, 1, 8, 2, 128, 96, 48, 8
    else:
        b, s, h, hkv, hd, p, window, sx = 2, 8, 4, 4, 64, 96, 48, 8
    last = 63
    k, v, sp = _mk_ring(rng, b, p, hkv, hd, last)
    q = jnp.asarray(rng.randn(b, s, h * hd).astype(np.float32) * 0.3)
    q_pos = jnp.asarray(
        np.stack([np.arange(s) + last + 1 + sx for _ in range(b)]), jnp.int32)
    xk = jnp.asarray(rng.randn(b, sx, hkv * hd).astype(np.float32) * 0.3)
    xv = jnp.asarray(rng.randn(b, sx, hkv * hd).astype(np.float32) * 0.3)
    # extra columns: some valid recent positions, some INVALID padding
    xp = np.stack([last + 1 + np.arange(sx) for _ in range(b)])
    xp[:, -2:] = SLOT_INVALID
    xp = jnp.asarray(xp, jnp.int32)

    out = ring_gqa_attention(q, k, v, sp, q_pos, window=window, heads=h,
                             kv_heads=hkv, head_dim=hd,
                             extra_k=xk, extra_v=xv, extra_pos=xp,
                             interpret=True)
    ref = _oracle(q, k, v, sp, q_pos, window, hkv, hd, extra=(xk, xv, xp))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_fully_masked_rows_are_zero():
    rng = np.random.RandomState(3)
    b, s, h, hkv, hd, p, window = 1, 4, 2, 2, 64, 32, 16
    k, v, sp = _mk_ring(rng, b, p, hkv, hd, last_pos=10)
    q = jnp.asarray(rng.randn(b, s, h * hd).astype(np.float32))
    q_pos = jnp.asarray(np.full((b, s), SLOT_INVALID), jnp.int32)  # padding
    out = ring_gqa_attention(q, k, v, sp, q_pos, window=window, heads=h,
                             kv_heads=hkv, head_dim=hd, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_kernel_bf16_ring_f32_queries():
    rng = np.random.RandomState(11)
    b, s, h, hkv, hd, p, window = 2, 1, 8, 2, 128, 64, 32
    k, v, sp = _mk_ring(rng, b, p, hkv, hd, last_pos=50, dtype=jnp.bfloat16)
    q = jnp.asarray(rng.randn(b, s, h * hd).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    q_pos = jnp.asarray(np.full((b, s), 51), jnp.int32)
    out = ring_gqa_attention(q, k, v, sp, q_pos, window=window, heads=h,
                             kv_heads=hkv, head_dim=hd, interpret=True)
    ref = _oracle(q, k, v, sp, q_pos, window, hkv, hd)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def _quant_ring(k, hkv, hd):
    """[B, P, hkv*hd] f32 -> (int8 ring, [B, hkv, P] scales)."""
    b, p, _ = k.shape
    k4 = np.asarray(k, np.float32).reshape(b, p, hkv, hd)
    amax = np.abs(k4).max(-1)                       # [B, P, hkv]
    s = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(k4 / s[..., None]), -127, 127).astype(np.int8)
    return (jnp.asarray(q.reshape(b, p, hkv * hd)),
            jnp.asarray(np.swapaxes(s, 1, 2)))      # [B, hkv, P]


@pytest.mark.parametrize("case", ["decode_gqa", "encoder_mha"])
def test_kernel_int8_ring_matches_dequant_oracle(case):
    rng = np.random.RandomState(5)
    if case == "decode_gqa":
        b, s, h, hkv, hd, p, window, sx = 2, 1, 8, 2, 128, 96, 48, 8
    else:
        b, s, h, hkv, hd, p, window, sx = 2, 8, 4, 4, 64, 96, 48, 8
    last = 80
    kf, vf, sp = _mk_ring(rng, b, p, hkv, hd, last)
    kq, ks = _quant_ring(kf, hkv, hd)
    vq, vs = _quant_ring(vf, hkv, hd)
    # the oracle sees the DEQUANTIZED ring (what int8 storage represents)
    kd = (np.asarray(kq, np.float32).reshape(b, p, hkv, hd)
          * np.swapaxes(np.asarray(ks), 1, 2)[..., None]).reshape(b, p, -1)
    vd = (np.asarray(vq, np.float32).reshape(b, p, hkv, hd)
          * np.swapaxes(np.asarray(vs), 1, 2)[..., None]).reshape(b, p, -1)
    q = jnp.asarray(rng.randn(b, s, h * hd).astype(np.float32) * 0.3)
    q_pos = jnp.asarray(
        np.stack([np.arange(s) + last + 1 + sx for _ in range(b)]), jnp.int32)
    xk = jnp.asarray(rng.randn(b, sx, hkv * hd).astype(np.float32) * 0.3)
    xv = jnp.asarray(rng.randn(b, sx, hkv * hd).astype(np.float32) * 0.3)
    xp = jnp.asarray(
        np.stack([last + 1 + np.arange(sx) for _ in range(b)]), jnp.int32)

    out = ring_gqa_attention(q, kq, vq, sp, q_pos, window=window, heads=h,
                             kv_heads=hkv, head_dim=hd,
                             k_scale=ks, v_scale=vs,
                             extra_k=xk, extra_v=xv, extra_pos=xp,
                             interpret=True)
    ref = _oracle(q, jnp.asarray(kd), jnp.asarray(vd), sp, q_pos, window,
                  hkv, hd, extra=(xk, xv, xp))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def _mk_prefix_ring(rng, b, p, hkv, hd, n_valid):
    """Ring filled as a prefix [0, n_valid) — the lockstep-cursor regime the
    prefix-bucket optimization relies on (slots >= n_valid never written)."""
    k = jnp.asarray(rng.randn(b, p, hkv * hd).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, p, hkv * hd).astype(np.float32) * 0.3)
    sp = np.where(np.arange(p) < n_valid, np.arange(p), SLOT_INVALID)
    return k, v, jnp.asarray(np.broadcast_to(sp, (b, p)), jnp.int32)


@pytest.mark.parametrize("case", ["decode_gqa", "encoder_mha"])
@pytest.mark.parametrize("p_limit", [32, 64, 96, 1024])
def test_kernel_p_limit_matches_full_read(case, p_limit):
    """Static p_limit >= valid prefix must not change the output (slots past
    the limit are invalid and contribute nothing to the full read either)."""
    rng = np.random.RandomState(11)
    if case == "decode_gqa":
        b, s, h, hkv, hd, p, window = 2, 1, 8, 2, 128, 96, 200
    else:
        b, s, h, hkv, hd, p, window = 2, 8, 4, 4, 64, 96, 200
    nv = 30
    k, v, sp = _mk_prefix_ring(rng, b, p, hkv, hd, nv)
    q = jnp.asarray(rng.randn(b, s, h * hd).astype(np.float32) * 0.3)
    q_pos = jnp.asarray(
        np.stack([np.arange(s) + nv for _ in range(b)]), jnp.int32)
    full = ring_gqa_attention(q, k, v, sp, q_pos, window=window, heads=h,
                              kv_heads=hkv, head_dim=hd, interpret=True)
    lim = ring_gqa_attention(q, k, v, sp, q_pos, window=window, heads=h,
                             kv_heads=hkv, head_dim=hd, p_limit=p_limit,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(lim), np.asarray(full),
                               rtol=2e-5, atol=2e-5)


def test_dispatcher_n_valid_slots_traced():
    """ring_attention with a TRACED n_valid_slots (lax.switch over prefix
    buckets) must match the oracle, at several fill levels incl. full."""
    from voxtral_tpu.ops.pallas_attention import ring_attention, slot_buckets
    rng = np.random.RandomState(3)
    b, s, h, hkv, hd, p, window = 2, 1, 8, 2, 128, 512, 600
    assert len(slot_buckets(p)) > 1
    for nv in (5, 200, 512):
        k, v, sp = _mk_prefix_ring(rng, b, p, hkv, hd, nv)
        q = jnp.asarray(rng.randn(b, s, h * hd).astype(np.float32) * 0.3)
        q_pos = jnp.full((b, s), nv, jnp.int32)

        @jax.jit
        def go(q, k, v, sp, q_pos, nv_t):
            return ring_attention(q, k, v, sp, q_pos, window=window,
                                  heads=h, kv_heads=hkv, head_dim=hd,
                                  n_valid_slots=nv_t, force_pallas=True)

        out = go(q, k, v, sp, q_pos, jnp.int32(nv))
        ref = _oracle(q, k, v, sp, q_pos, window, hkv, hd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"nv={nv}")


@pytest.mark.parametrize("case", ["decode_gqa", "encoder_mha"])
def test_kernel_int4_packed_ring_matches_dequant_oracle(case):
    """Nibble-packed int4 rings (quant.py:quantize_kv_int4): the kernel's
    in-VMEM unpack + two half-width dots must equal the oracle run on the
    DEQUANTIZED ring (what the packed storage represents) exactly."""
    from voxtral_tpu.quant import quantize_kv_int4, unpack_int4
    rng = np.random.RandomState(5)
    if case == "decode_gqa":
        b, s, h, hkv, hd, p, window, sx = 2, 1, 8, 2, 128, 96, 48, 8
    else:
        b, s, h, hkv, hd, p, window, sx = 2, 8, 4, 4, 64, 96, 48, 8
    last = 80
    kf, vf, sp = _mk_ring(rng, b, p, hkv, hd, last)
    kq, ks = jax.jit(quantize_kv_int4, static_argnums=(1, 2))(kf, hkv, hd)
    vq, vs = jax.jit(quantize_kv_int4, static_argnums=(1, 2))(vf, hkv, hd)

    def dequant(q_packed, scales):
        lo, hi = unpack_int4(q_packed.reshape(b, p, hkv, hd // 2))
        vals = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
        return (vals * jnp.swapaxes(scales, 1, 2)[..., None]
                ).reshape(b, p, hkv * hd)

    q = jnp.asarray(rng.randn(b, s, h * hd).astype(np.float32) * 0.3)
    q_pos = jnp.asarray(
        np.stack([np.arange(s) + last + 1 + sx for _ in range(b)]), jnp.int32)
    xk = jnp.asarray(rng.randn(b, sx, hkv * hd).astype(np.float32) * 0.3)
    xv = jnp.asarray(rng.randn(b, sx, hkv * hd).astype(np.float32) * 0.3)
    xp = jnp.asarray(
        np.stack([last + 1 + np.arange(sx) for _ in range(b)]), jnp.int32)

    out = ring_gqa_attention(q, kq, vq, sp, q_pos, window=window, heads=h,
                             kv_heads=hkv, head_dim=hd,
                             k_scale=ks, v_scale=vs,
                             extra_k=xk, extra_v=xv, extra_pos=xp,
                             interpret=True)
    ref = _oracle(q, dequant(kq, ks), dequant(vq, vs), sp, q_pos, window,
                  hkv, hd, extra=(xk, xv, xp))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kv_packed_ring_width_mismatch_raises():
    """An EXPLICIT kv_packed that contradicts the ring lane width is a
    layout bug and must fail loudly (ADVICE r4): a half-lane ring with
    kv_packed=False would otherwise be silently nibble-decoded, and a
    full-width ring with kv_packed=True mis-split."""
    rng = np.random.RandomState(9)
    b, s, h, hkv, hd, p = 1, 1, 4, 2, 64, 96
    q = jnp.asarray(rng.randn(b, s, h * hd).astype(np.float32))
    sp = jnp.zeros((b, p), jnp.int32)
    q_pos = jnp.ones((b, s), jnp.int32)
    scales = jnp.ones((b, hkv, p), jnp.float32)
    half = jnp.zeros((b, p, hkv * hd // 2), jnp.int8)
    with pytest.raises(ValueError, match="kv_packed"):
        ring_gqa_attention(q, half, half, sp, q_pos, window=48, heads=h,
                           kv_heads=hkv, head_dim=hd, k_scale=scales,
                           v_scale=scales, kv_packed=False, interpret=True)
    fullw = jnp.zeros((b, p, hkv * hd), jnp.int8)
    with pytest.raises(ValueError, match="kv_packed"):
        ring_gqa_attention(q, fullw, fullw, sp, q_pos, window=48, heads=h,
                           kv_heads=hkv, head_dim=hd, k_scale=scales,
                           v_scale=scales, kv_packed=True, interpret=True)
