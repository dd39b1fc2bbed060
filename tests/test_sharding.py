"""Multi-chip sharding + fleet path: TP+DP fleet step on the virtual
8-device CPU mesh must produce the SAME tokens as unsharded execution, and
the lockstep fleet pipeline must agree with the general streaming engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxtral_tpu.config import (
    DecoderConfig, EncoderConfig, StreamingConfig, VoxtralConfig,
)
from voxtral_tpu.models.decoder import ada_scales, time_conditioning
from voxtral_tpu.parallel.sharding import (
    fleet_state_pspecs, make_mesh, shard_params, shard_tree,
)
from voxtral_tpu.runtime.fleet import (
    fleet_bootstrap, fleet_step, init_fleet_state,
)
from voxtral_tpu.weights import random_params


@pytest.fixture(scope="module", autouse=True)
def _fresh_caches():
    """The virtual-8-device mesh tests allocate large CPU executables on
    top of everything ~90 earlier tests compiled; with round 4's scoped
    TP caches (tp_scoped_jit) nothing clears them implicitly any more,
    and the accumulated executables segfault XLA:CPU mid-suite (observed
    2/2 full runs; any subset passes). Free them at this module boundary
    — test-process hygiene only; production keeps the scoped caches."""
    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def small_cfg():
    return VoxtralConfig(
        encoder=EncoderConfig(dim=128, layers=2, heads=8, head_dim=32,
                              hidden=256, window=64),
        decoder=DecoderConfig(dim=256, layers=2, heads=8, kv_heads=8,
                              head_dim=32, hidden=512, window=128,
                              vocab_size=2048, ada_dim=8),
        streaming=StreamingConfig(n_special=100),
        downsample=4, adapter_hidden=256)


@pytest.fixture(scope="module")
def small_params(small_cfg):
    return random_params(small_cfg, seed=5)


def _t_ada(cfg, params):
    return ada_scales(params["decoder"],
                      time_conditioning(cfg.streaming.delay_tokens,
                                        cfg.decoder.dim))


def _run_fleet(cfg, params, state, mel_first, mel_chunks, t_ada):
    state, toks0, _ = fleet_bootstrap(params, cfg, state, mel_first, t_ada)
    toks = [np.asarray(toks0)]
    for mel in mel_chunks:
        state, t, _ = fleet_step(params, cfg, state, mel, t_ada)
        toks.append(np.asarray(t))
    return np.concatenate(toks, axis=1)


def test_tp_dp_fleet_matches_single_device(small_cfg, small_params):
    cfg, params = small_cfg, small_params
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    t_ada = _t_ada(cfg, params)
    rng = np.random.RandomState(0)
    b = 4
    mel_first = jnp.asarray(
        rng.rand(b, cfg.audio.mel_bins, 320).astype(np.float32))
    mel_chunks = [jnp.asarray(rng.rand(b, cfg.audio.mel_bins, 64)
                              .astype(np.float32)) for _ in range(3)]

    state0 = init_fleet_state(cfg, batch=b, enc_ring=512, dec_ring=128)
    ref_tokens = _run_fleet(cfg, params, state0, mel_first, mel_chunks, t_ada)

    mesh = make_mesh(2, 4)
    sp = shard_params(params, cfg, mesh)
    st = shard_tree(init_fleet_state(cfg, batch=b, enc_ring=512, dec_ring=128),
                    fleet_state_pspecs(cfg), mesh)
    tp_tokens = _run_fleet(cfg, sp, st, mel_first, mel_chunks, t_ada)
    np.testing.assert_array_equal(ref_tokens, tp_tokens)


def test_fleet_matches_streaming_engine(small_cfg, small_params):
    """Lockstep fleet pipeline on real audio == the general VoxStream."""
    from voxtral_tpu.audio.mel import MelStream
    from voxtral_tpu.runtime import StreamConfig, VoxStream
    cfg, params = small_cfg, small_params
    t_ada = _t_ada(cfg, params)
    rng = np.random.RandomState(1)
    audio = (rng.randn(5 * 16000) * 0.3).astype(np.float32)

    s = VoxStream(params, cfg, stream_cfg=StreamConfig(interval=0.64))
    s.feed(audio)
    s.finish()
    stream_ids = s.get_ids()                  # text tokens only

    mult = cfg.audio.raw_audio_per_token
    ms = MelStream(left_pad_samples=cfg.streaming.n_left_pad_tokens * mult)
    ms.feed(audio)
    align = (mult - (len(audio) % mult)) % mult
    ms.feed(np.zeros(align + cfg.streaming.n_right_pad_tokens * mult,
                     np.float32))
    ms.finish()
    mel = ms.frames()                          # [F, 128]

    t0, t = 320, 64
    state = init_fleet_state(cfg, batch=1, enc_ring=512, dec_ring=128)
    state, toks0, _ = fleet_bootstrap(
        params, cfg, state, jnp.asarray(mel[:t0].T[None]), t_ada)
    toks = [np.asarray(toks0[0])]
    pos = t0
    while pos + t <= mel.shape[0]:
        state, tk, _ = fleet_step(params, cfg, state,
                                  jnp.asarray(mel[pos:pos + t].T[None]), t_ada)
        toks.append(np.asarray(tk[0]))
        pos += t
    fleet_ids = [int(x) for x in np.concatenate(toks)
                 if x >= cfg.streaming.n_special]
    # fleet covers floor(F/64) chunks; stream covers all mel -> prefix match
    assert len(fleet_ids) > 10
    assert fleet_ids == stream_ids[:len(fleet_ids)]


def test_int8_fleet_state_shards(small_cfg):
    """Int8 KV state tree places correctly on the mesh (rings head-sharded,
    scale tables [B, Hkv, P] sharded the same way)."""
    from voxtral_tpu.parallel.sharding import (
        fleet_state_pspecs, make_mesh, shard_tree,
    )
    from voxtral_tpu.runtime.fleet import init_fleet_state

    mesh = make_mesh(2, 4)
    state = init_fleet_state(small_cfg, batch=4, enc_ring=128, dec_ring=128,
                             kv_dtype="int8")
    sharded = shard_tree(state, fleet_state_pspecs(small_cfg, "int8"), mesh)
    ks = sharded.decode.k_scale[0]
    assert ks.sharding.spec == ("data", "model", None)
    assert sharded.decode.k_ring[0].dtype == jnp.int8


def test_tp_dp_int8_fleet_matches_single_device(small_cfg, small_params):
    """Int8 KV rings force the Pallas kernel, which GSPMD cannot partition:
    under use_tp_mesh the kernel runs inside shard_map (heads on 'model',
    streams on 'data') and must reproduce the single-device tokens."""
    from voxtral_tpu.parallel.sharding import use_tp_mesh
    cfg, params = small_cfg, small_params
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    t_ada = _t_ada(cfg, params)
    rng = np.random.RandomState(2)
    b = 2
    mel_first = jnp.asarray(
        rng.rand(b, cfg.audio.mel_bins, 320).astype(np.float32))
    mel_chunks = [jnp.asarray(rng.rand(b, cfg.audio.mel_bins, 64)
                              .astype(np.float32)) for _ in range(2)]

    state0 = init_fleet_state(cfg, batch=b, enc_ring=512, dec_ring=128,
                              kv_dtype="int8")
    ref_tokens = _run_fleet(cfg, params, state0, mel_first, mel_chunks, t_ada)

    mesh = make_mesh(2, 4)
    with use_tp_mesh(mesh):
        sp = shard_params(params, cfg, mesh)
        st = shard_tree(
            init_fleet_state(cfg, batch=b, enc_ring=512, dec_ring=128,
                             kv_dtype="int8"),
            fleet_state_pspecs(cfg, "int8"), mesh)
        tp_tokens = _run_fleet(cfg, sp, st, mel_first, mel_chunks, t_ada)
    np.testing.assert_array_equal(ref_tokens, tp_tokens)


def test_tp_scoped_jit_keeps_caches_across_mesh_contexts():
    """VERDICT r3 next #6: opening and closing a meshed manager in a warm
    process must leave previously compiled (unmeshed) programs live.
    tp_scoped_jit keeps one jit instance per TP context, so a context
    switch selects a different cache instead of clearing anything."""
    import jax.numpy as jnp
    from voxtral_tpu.parallel.sharding import (
        make_mesh, tp_scoped_jit, use_tp_mesh)

    traces = []

    @tp_scoped_jit
    def f(x):
        traces.append(1)
        return x * 2.0

    x = jnp.ones((4,))
    f(x)
    assert len(traces) == 1
    mesh = make_mesh(1, 1)
    with use_tp_mesh(mesh):
        f(x)                       # new context -> its own trace
        assert len(traces) == 2
        f(x)
        assert len(traces) == 2    # cached within the context
    f(x)
    assert len(traces) == 2        # unmeshed trace SURVIVED the mesh
    with use_tp_mesh(mesh):
        f(x)
        assert len(traces) == 2    # meshed trace survived the exit too
