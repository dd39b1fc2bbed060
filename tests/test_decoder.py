"""Decoder parity vs reference goldens: prefill + greedy schedule, ring
compaction past the window, ada time conditioning, logits."""

import jax.numpy as jnp
import numpy as np

from conftest import load_fixture
from voxtral_tpu.models import (
    ada_scales, decode_scan, decoder_prefill, init_decode_state,
    time_conditioning,
)
from voxtral_tpu.models.pipeline import prompt_token_ids


def test_time_conditioning(tiny_cfg):
    g = load_fixture("decoder.npz")
    ours = time_conditioning(tiny_cfg.streaming.delay_tokens,
                             tiny_cfg.decoder.dim)
    np.testing.assert_allclose(np.asarray(ours), g["t_cond"], atol=1e-6)


def _run_decode(tiny_cfg, tiny_params, adapter, n_steps=None, batch_pad=0):
    g = load_fixture("decoder.npz")
    prompt = prompt_token_ids(tiny_cfg, tiny_cfg.streaming.delay_tokens)
    lp = len(prompt)
    t_ada = ada_scales(tiny_params["decoder"],
                       jnp.asarray(g["t_cond"]))
    embed = tiny_params["decoder"]["embed"]
    prefix = (jnp.asarray(adapter[:lp - 1])
              + embed[jnp.asarray(prompt[:lp - 1])].astype(jnp.float32))
    state = init_decode_state(tiny_cfg, batch=1)
    state = decoder_prefill(tiny_params["decoder"], tiny_cfg, state,
                            prefix[None], t_ada)
    state = state._replace(prev_token=jnp.asarray([prompt[-1]], jnp.int32))
    frames = adapter[lp - 1:]
    n = len(frames) if n_steps is None else n_steps
    padded = np.zeros((n + batch_pad, adapter.shape[1]), np.float32)
    padded[:n] = frames[:n]
    state, tokens, aux = decode_scan(
        tiny_params["decoder"], tiny_cfg, state, jnp.asarray(padded)[None],
        jnp.asarray([n], jnp.int32), t_ada, collect_topk=8, stop_at_eos=False)
    return state, np.asarray(tokens[0]), aux


def test_greedy_tokens_match_reference(tiny_cfg, tiny_params):
    """Bit-identical greedy token sequence vs the torch reference, including
    positions past the sliding window (ring compaction)."""
    g = load_fixture("decoder.npz")
    _, tokens, aux = _run_decode(tiny_cfg, tiny_params, g["adapter"])
    n = len(g["tokens"])
    assert tokens.shape[0] == n
    np.testing.assert_array_equal(tokens, g["tokens"])


def test_logits_match_reference(tiny_cfg, tiny_params):
    """Alt-candidate logit values track the reference's full logits closely,
    and the candidate set honors the alt mask (no specials, no emitted
    token; see models/decoder.py:alt_candidates)."""
    g = load_fixture("decoder.npz")
    _, tokens, aux = _run_decode(tiny_cfg, tiny_params, g["adapter"])
    ref_logits = g["logits"]                      # [N, V]
    vals = np.asarray(aux["topk_vals"][0])        # [N, 8]
    idxs = np.asarray(aux["topk_idx"][0])
    best = np.asarray(aux["best_logit"][0])
    ns = tiny_cfg.streaming.n_special
    for step in range(ref_logits.shape[0]):
        assert (idxs[step] >= ns).all()
        assert (idxs[step] != tokens[step]).all()
        ref_at_idx = ref_logits[step][idxs[step]]
        np.testing.assert_allclose(vals[step], ref_at_idx, atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(best[step], ref_logits[step][tokens[step]],
                                   atol=2e-4, rtol=1e-3)


def test_bucket_padding_is_inert(tiny_cfg, tiny_params):
    """Padding frames beyond n_valid must not change tokens or state."""
    g = load_fixture("decoder.npz")
    _, tok_a, _ = _run_decode(tiny_cfg, tiny_params, g["adapter"])
    _, tok_b, _ = _run_decode(tiny_cfg, tiny_params, g["adapter"], batch_pad=9)
    np.testing.assert_array_equal(tok_a, tok_b[:len(tok_a)])
    assert (tok_b[len(tok_a):] == -1).all()


def test_split_decode_equals_single_scan(tiny_cfg, tiny_params):
    """Decoding the backlog in several decode_scan calls (as streaming does)
    must equal one big scan — state carries exactly."""
    g = load_fixture("decoder.npz")
    prompt = prompt_token_ids(tiny_cfg, tiny_cfg.streaming.delay_tokens)
    lp = len(prompt)
    t_ada = ada_scales(tiny_params["decoder"], jnp.asarray(g["t_cond"]))
    embed = tiny_params["decoder"]["embed"]
    adapter = g["adapter"]
    prefix = (jnp.asarray(adapter[:lp - 1])
              + embed[jnp.asarray(prompt[:lp - 1])].astype(jnp.float32))
    state = init_decode_state(tiny_cfg, batch=1)
    state = decoder_prefill(tiny_params["decoder"], tiny_cfg, state,
                            prefix[None], t_ada)
    state = state._replace(prev_token=jnp.asarray([prompt[-1]], jnp.int32))
    frames = adapter[lp - 1:]
    toks = []
    pos = 0
    for size in (1, 5, 2, 9, 5):
        chunk = frames[pos:pos + size]
        state, t, _ = decode_scan(
            tiny_params["decoder"], tiny_cfg, state, jnp.asarray(chunk)[None],
            jnp.asarray([size], jnp.int32), t_ada, stop_at_eos=False)
        toks.append(np.asarray(t[0]))
        pos += size
    np.testing.assert_array_equal(np.concatenate(toks), g["tokens"])


def test_long_decode_ring_size_invariance(tiny_cfg, tiny_params):
    """Long-form semantics: a minimal ring that wraps many times must decode
    the exact same tokens as a ring large enough to never wrap — the
    fixed-shape analogue of the reference's memmove compaction staying
    lossless for audio of unbounded length (voxtral_decoder.c:354-384)."""
    rng = np.random.RandomState(7)
    d = tiny_cfg.decoder
    n = 120                               # >> window (32), wraps small ring 2x+
    frames = jnp.asarray(rng.randn(1, n, d.dim).astype(np.float32) * 0.1)
    prefix = jnp.asarray(rng.randn(1, 4, d.dim).astype(np.float32) * 0.1)
    t_ada = ada_scales(tiny_params["decoder"],
                       time_conditioning(6, tiny_cfg.decoder.dim))

    def run(ring_size):
        state = init_decode_state(tiny_cfg, batch=1, ring_size=ring_size,
                                  pending_size=8)
        state = decoder_prefill(tiny_params["decoder"], tiny_cfg, state,
                                prefix, t_ada)
        toks = []
        for c0 in range(0, n, 8):
            state, t, _ = decode_scan(
                tiny_params["decoder"], tiny_cfg, state, frames[:, c0:c0 + 8],
                jnp.asarray([8], jnp.int32), t_ada, stop_at_eos=False)
            toks.append(np.asarray(t[0]))
        return np.concatenate(toks)

    small = run(d.window + 8)             # wraps repeatedly
    big = run(512)                        # never wraps
    np.testing.assert_array_equal(small, big)
