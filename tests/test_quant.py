"""Q8 quantized-weight path: format parity with the reference quantizer
(quantize.py:34-43), dispatching in ops/linear.py, and end-to-end model
quality (quantized greedy tokens vs full-precision on the tiny model)."""

import numpy as np
import jax
import jax.numpy as jnp

from conftest import load_fixture
from voxtral_tpu.ops.linear import embed_logits, embed_lookup, linear
from voxtral_tpu.quant import (
    Quantized, dequantize, quantize_jax, quantize_np, quantize_params,
)
from voxtral_tpu.weights import SafetensorsFile, load_params, save_safetensors


def test_quantize_np_matches_reference_rule():
    rng = np.random.RandomState(0)
    w = rng.randn(16, 32).astype(np.float32)
    qt = quantize_np(w, axis=0)              # per safetensors-row
    assert qt.q.dtype == np.int8 and qt.s.shape == (16,)
    np.testing.assert_allclose(qt.s, np.abs(w).max(axis=1) / 127.0, rtol=1e-6)
    # reconstruction error bounded by half a quantization step per element
    recon = qt.q.astype(np.float32) * qt.s[:, None]
    assert np.max(np.abs(recon - w) / qt.s[:, None]) <= 0.5 + 1e-5


def test_linear_quantized_matches_dequantized():
    rng = np.random.RandomState(1)
    w = rng.randn(24, 40).astype(np.float32) * 0.1
    x = jnp.asarray(rng.randn(4, 24).astype(np.float32))
    qt = quantize_np(w.T, axis=0)             # ref layout [out, in]
    wq = Quantized(q=jnp.asarray(np.ascontiguousarray(qt.q.T)),
                   s=jnp.asarray(qt.s))       # ours: [in, out], s on out
    y_q = linear(x, wq)
    y_ref = x @ jnp.asarray(dequantize(wq))
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_linear_quantized_bias_and_bf16():
    rng = np.random.RandomState(2)
    w = rng.randn(24, 40).astype(np.float32) * 0.1
    b = rng.randn(40).astype(np.float32)
    x = jnp.asarray(rng.randn(4, 24), jnp.bfloat16)
    wq = quantize_jax(jnp.asarray(w), axis=-1)
    y = linear(x, wq, b)
    assert y.dtype == jnp.bfloat16
    y_ref = (x.astype(jnp.float32) @ dequantize(wq) + b)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(y_ref),
                               rtol=0.05, atol=0.05)


def test_embed_quantized_lookup_and_logits():
    rng = np.random.RandomState(3)
    emb = rng.randn(50, 16).astype(np.float32) * 0.2
    eq = quantize_jax(jnp.asarray(emb), axis=0)    # per-vocab-row scales
    ids = jnp.asarray([0, 7, 49])
    rows = embed_lookup(eq, ids)
    ref_rows = np.asarray(dequantize(eq))[np.asarray(ids)]
    np.testing.assert_allclose(np.asarray(rows), ref_rows, rtol=1e-5, atol=1e-6)
    h = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    logits = embed_logits(h, eq)
    ref = np.asarray(h) @ np.asarray(dequantize(eq)).T
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-4, atol=1e-4)


def test_q8_safetensors_interop(tmp_path, tiny_cfg, tiny_params):
    """quantize_params -> reference-layout Q8 file -> load_params gives the
    same Quantized leaves (bit-exact int8 + scales)."""
    from voxtral_tpu.weights import params_to_safetensors
    import tools.quantize as qtool

    f32_path = str(tmp_path / "f32.safetensors")
    q8_path = str(tmp_path / "q8.safetensors")
    params_to_safetensors(tiny_params, tiny_cfg, f32_path)
    qtool.quantize_file(f32_path, q8_path, verbose=False)

    loaded = load_params(q8_path, tiny_cfg, device_put=False)
    wq = loaded["decoder"]["layers"][0]["wq"]
    assert isinstance(wq, Quantized)
    # cross-check against quantizing the original in-tree weight directly
    ref_q = quantize_np(
        np.asarray(tiny_params["decoder"]["layers"][0]["wq"],
                   dtype=np.float32).T, axis=0)
    np.testing.assert_array_equal(np.asarray(wq.q), ref_q.q.T)
    np.testing.assert_allclose(np.asarray(wq.s), ref_q.s, rtol=1e-6)
    emb = loaded["decoder"]["embed"]
    assert isinstance(emb, Quantized) and emb.axis == 0
    assert emb.s.shape[0] == tiny_cfg.decoder.vocab_size


def test_q8_pipeline_tokens(tiny_cfg, tiny_params):
    """Greedy tokens with Q8 weights on the tiny golden audio: the model is
    tiny and random so quantization noise is relatively large — require the
    transcription to still start with the reference tokens and the logits to
    stay highly correlated."""
    from voxtral_tpu.models.pipeline import transcribe_tokens_batch

    g = load_fixture("pipeline.npz")
    qparams = quantize_params(jax.tree.map(jnp.asarray, tiny_params))
    tokens_q, _ = transcribe_tokens_batch(qparams, tiny_cfg, g["audio"])
    tokens_f, _ = transcribe_tokens_batch(tiny_params, tiny_cfg, g["audio"])
    # same length decode schedule; token agreement >= 80% on the tiny model
    agree = np.mean([a == b for a, b in zip(tokens_q, tokens_f)])
    assert agree >= 0.8, (tokens_q, tokens_f)


def test_int4_pack_roundtrip():
    """quantize_kv_int4 -> unpack_int4 recovers the exact quantized values
    (halves packing convention), and dequantization error is bounded by
    half a scale step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from voxtral_tpu.quant import quantize_kv_int4, unpack_int4

    rng = np.random.RandomState(0)
    b, s, hkv, hd = 2, 5, 3, 8
    x = jnp.asarray(rng.randn(b, s, hkv * hd).astype(np.float32))
    packed, scales = jax.jit(quantize_kv_int4, static_argnums=(1, 2))(
        x, hkv, hd)
    assert packed.shape == (b, s, hkv * hd // 2) and packed.dtype == jnp.int8
    assert scales.shape == (b, hkv, s)
    lo, hi = unpack_int4(packed.reshape(b, s, hkv, hd // 2))
    vals = np.concatenate([np.asarray(lo), np.asarray(hi)], axis=-1)
    assert vals.min() >= -8 and vals.max() <= 7
    s_np = np.swapaxes(np.asarray(scales), 1, 2)[..., None]  # [B, S, Hkv, 1]
    deq = vals * s_np
    err = np.abs(deq.reshape(b, s, -1) - np.asarray(x))
    assert (err <= 0.5 * s_np.max() + 1e-6).all()
