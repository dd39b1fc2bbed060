"""Encoder/adapter parity vs reference goldens + incremental==batch."""

import jax.numpy as jnp
import numpy as np

from conftest import load_fixture
from voxtral_tpu.models import (
    adapter_forward, conv_stem, encoder_forward, encoder_incremental,
    init_encoder_state,
)


def test_encoder_matches_reference(tiny_cfg, tiny_params):
    g = load_fixture("encoder.npz")
    h = conv_stem(tiny_params["encoder"], jnp.asarray(g["mel"]))
    trunc = h.shape[0] % tiny_cfg.downsample
    if trunc:
        h = h[trunc:]
    enc = encoder_forward(tiny_params["encoder"], tiny_cfg, h)
    np.testing.assert_allclose(np.asarray(enc), g["enc_out"],
                               atol=2e-5, rtol=1e-4)


def test_adapter_matches_reference(tiny_cfg, tiny_params):
    g = load_fixture("encoder.npz")
    ada = adapter_forward(tiny_params["adapter"], tiny_cfg,
                          jnp.asarray(g["enc_out"]))
    np.testing.assert_allclose(np.asarray(ada), g["adapter_out"],
                               atol=2e-5, rtol=1e-4)


def test_incremental_encoder_equals_batch(tiny_cfg, tiny_params):
    """Chunked ring-cache encoder == full batch forward, with window
    compaction exercised (window 24 << 96 positions)."""
    rng = np.random.RandomState(11)
    s = 96
    h_full = jnp.asarray(rng.randn(s, tiny_cfg.encoder.dim).astype(np.float32))
    batch_out = encoder_forward(tiny_params["encoder"], tiny_cfg, h_full)

    state = init_encoder_state(tiny_cfg, ring_size=64)
    outs = []
    pos = 0
    for size in (5, 1, 17, 3, 30, 40):
        chunk = h_full[pos:pos + size]
        state, out = encoder_incremental(
            tiny_params["encoder"], tiny_cfg, state, chunk[None])
        outs.append(np.asarray(out[0]))
        pos += size
    inc = np.concatenate(outs)
    np.testing.assert_allclose(inc, np.asarray(batch_out), atol=3e-5, rtol=1e-4)


def test_incremental_encoder_padding_mask(tiny_cfg, tiny_params):
    """Bucket-padded chunks (n_valid < S) must not disturb results."""
    rng = np.random.RandomState(12)
    s = 40
    h_full = jnp.asarray(rng.randn(s, tiny_cfg.encoder.dim).astype(np.float32))
    batch_out = encoder_forward(tiny_params["encoder"], tiny_cfg, h_full)

    state = init_encoder_state(tiny_cfg, ring_size=48)
    outs = []
    pos = 0
    for size in (16, 8, 16):
        pad_to = 16
        chunk = np.zeros((pad_to, tiny_cfg.encoder.dim), np.float32)
        chunk[:size] = np.asarray(h_full[pos:pos + size])
        # poison the padding rows to prove they are masked
        chunk[size:] = 1e3
        state, out = encoder_incremental(
            tiny_params["encoder"], tiny_cfg, state, jnp.asarray(chunk)[None],
            n_valid=size)
        outs.append(np.asarray(out[0])[:size])
        pos += size
    inc = np.concatenate(outs)
    np.testing.assert_allclose(inc, np.asarray(batch_out), atol=3e-5, rtol=1e-4)


def test_incremental_encoder_int4_ring_close_to_batch(tiny_cfg, tiny_params):
    """int4-packed encoder rings (quant.py:quantize_kv_int4): the chunked
    encoder with nibble-packed KV must track the full-precision batch
    forward within quantization tolerance (int4 is lossy by design — the
    pin here is that packing/unpacking/scales compose correctly through
    fold + ring attention, incl. ring wrap)."""
    rng = np.random.RandomState(11)
    s = 96
    h_full = jnp.asarray(rng.randn(s, tiny_cfg.encoder.dim).astype(np.float32))
    batch_out = encoder_forward(tiny_params["encoder"], tiny_cfg, h_full)

    for kv in ("int8", "int4"):
        state = init_encoder_state(tiny_cfg, ring_size=64, kv_dtype=kv)
        outs, pos = [], 0
        for size in (5, 1, 17, 3, 30, 40):
            chunk = h_full[pos:pos + size]
            state, out = encoder_incremental(
                tiny_params["encoder"], tiny_cfg, state, chunk[None])
            outs.append(np.asarray(out[0]))
            pos += size
        inc = np.concatenate(outs)
        err = np.abs(inc - np.asarray(batch_out)).max()
        tol = 0.05 if kv == "int8" else 0.6   # int4: ~16x coarser codes
        assert err < tol, (kv, err)
        if kv == "int4":
            assert state.k_ring[0].shape[-1] == tiny_cfg.encoder.attn_dim // 2
