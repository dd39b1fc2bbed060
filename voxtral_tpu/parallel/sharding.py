"""Mesh + sharding rules: TP over attention heads / FFN / vocab, DP over
concurrent streams.

The reference is single-device (SURVEY.md §2.4); this layer realizes the
BASELINE.json north star: NamedShardings over a ('data', 'model') mesh,
XLA/GSPMD inserts the collectives (psum after row-sharded wo/w2 matmuls,
all-gather/argmax for the vocab-sharded logits) — ICI-resident by
construction, no hand-written NCCL analogue.

TP layout (megatron-style, applied to the stacked [L, ...] param tree):
- wq/wk/wv, w1/w3: column-sharded (output/head dim on 'model')
- wo, w2: row-sharded (input dim on 'model') -> psum
- embed: vocab-sharded (tied logits matmul shards the 131072 axis)
- norms, biases of row-sharded outputs, conv stem, ada MLP: replicated
- KV rings: sharded over KV heads (8-way max for the 4B decoder)
- all stream state: 'data'-sharded on the leading batch axis
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voxtral_tpu.config import VoxtralConfig

DATA, MODEL = "data", "model"

# Trace-time TP context: GSPMD cannot auto-partition a pallas_call, so the
# fused attention kernel must run under shard_map with explicit specs when a
# multi-device mesh is in play. The step functions are traced inside
# `use_tp_mesh(mesh)`; ops/pallas_attention.py consults `active_tp_mesh()`
# at trace time and wraps the kernel accordingly. (The pure-XLA oracle path
# needs none of this — GSPMD partitions it on its own.)
_TP_CTX: tuple | None = None


@contextlib.contextmanager
def use_tp_mesh(mesh: Mesh, data_axis: str = DATA, model_axis: str = MODEL):
    """Activate `mesh` for Pallas-kernel sharding while tracing/jitting the
    step functions. Trace-time only (no runtime effect): enter it once
    before the first call of each step function and keep it open for the
    serving session.

    Cache scoping (round 4, VERDICT r3 next #6): jaxpr traces are cached
    by shape/dtype only, and a trace made without shard_map must not be
    reused under a mesh (GSPMD cannot partition a pallas_call) — so every
    model-level entry point is jitted through tp_scoped_jit, which keeps
    ONE jit instance (with its own compile cache) PER TP context. Entering
    or leaving a mesh therefore switches caches instead of clearing them:
    a warm process that opens and closes a meshed manager keeps all its
    previously compiled unmeshed programs."""
    global _TP_CTX
    prev = _TP_CTX
    _TP_CTX = (mesh, data_axis, model_axis)
    try:
        yield
    finally:
        _TP_CTX = prev


def tp_scoped_jit(fun=None, **jit_kwargs):
    """jax.jit whose compiled-program cache is scoped by the active TP
    context: each distinct use_tp_mesh context gets its own jit instance,
    selected per call. Compiled programs survive context switches (one
    retained instance per distinct mesh context ever used — bounded and
    intended). Use for any function whose TRACE depends on
    active_tp_mesh() (everything reaching ops/pallas_attention.py)."""
    if fun is None:
        return lambda f: tp_scoped_jit(f, **jit_kwargs)
    instances: dict = {}

    def _new_instance():
        # jax.jit keyed on the same function object shares tracing caches
        # across wrappers — wrap in a per-instance closure (signature
        # preserved via functools.wraps so static_argnames still resolve)
        import functools

        @functools.wraps(fun)
        def distinct(*a, **k):
            return fun(*a, **k)

        return jax.jit(distinct, **jit_kwargs)

    def wrapper(*args, **kwargs):
        f = instances.get(_TP_CTX)
        if f is None:
            f = _new_instance()
            instances[_TP_CTX] = f
        return f(*args, **kwargs)

    wrapper.__name__ = getattr(fun, "__name__", "tp_scoped_jit")
    wrapper.__doc__ = fun.__doc__
    wrapper._tp_instances = instances       # test/introspection hook
    return wrapper


def active_tp_mesh() -> tuple | None:
    """(mesh, data_axis, model_axis) if tracing under use_tp_mesh, else
    None."""
    return _TP_CTX


def make_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(arr, (DATA, MODEL))


def param_pspecs(cfg: VoxtralConfig) -> dict:
    """PartitionSpec tree matching the param tree structure (per-layer
    dict tuples, see weights.py)."""
    rep = P()
    enc_layer = {
        "attn_norm": rep, "ffn_norm": rep,
        "wq": P(None, MODEL), "wq_b": P(MODEL),
        "wk": P(None, MODEL),
        "wv": P(None, MODEL), "wv_b": P(MODEL),
        "wo": P(MODEL, None), "wo_b": rep,
        "w1": P(None, MODEL), "w2": P(MODEL, None), "w2_b": rep,
        "w3": P(None, MODEL),
    }
    dec_layer = {
        "attn_norm": rep, "ffn_norm": rep,
        "wq": P(None, MODEL), "wk": P(None, MODEL),
        "wv": P(None, MODEL), "wo": P(MODEL, None),
        "w1": P(None, MODEL), "w2": P(MODEL, None),
        "w3": P(None, MODEL),
        "ada_down": rep, "ada_up": rep,
    }
    return {
        "encoder": {
            "conv0_w": rep, "conv0_b": rep, "conv1_w": rep, "conv1_b": rep,
            "layers": tuple(dict(enc_layer)
                            for _ in range(cfg.encoder.layers)),
            "norm": rep,
        },
        "adapter": {"w0": P(None, MODEL), "w1": P(MODEL, None)},
        "decoder": {
            "embed": P(MODEL, None),   # vocab-sharded tied embeddings
            "layers": tuple(dict(dec_layer)
                            for _ in range(cfg.decoder.layers)),
            "norm": rep,
        },
    }


def fleet_state_pspecs(cfg: VoxtralConfig,
                       kv_dtype: str = "float",
                       enc_kv_dtype: str | None = None) -> "FleetStatePspecs":
    """PartitionSpecs for FleetState (see runtime/fleet.py): stream batch on
    'data', KV heads on 'model'. Quantized KV ("int8"/"int4") adds the
    per-(slot, head) scale tables ([B, Hkv, P]: data-sharded streams,
    head-sharded scales). int4-packed rings shard the same way — the
    packed lane axis is head-major (hd/2 bytes per head), so a head-
    aligned model split stays head-local."""
    from voxtral_tpu.runtime.fleet import FleetState
    from voxtral_tpu.models.decoder import DecodeState
    from voxtral_tpu.models.encoder import EncoderState
    # per-layer ring tuples; merged head axis is head-sharded
    ring = P(DATA, None, MODEL)
    scale = P(DATA, MODEL, None)
    enc_l, dec_l = cfg.encoder.layers, cfg.decoder.layers
    int8 = kv_dtype in ("int8", "int4")
    enc_q = (enc_kv_dtype or kv_dtype) in ("int8", "int4")
    return FleetState(
        pcm_tail=P(DATA),
        mel_tail=P(DATA),
        conv0_tail=P(DATA),
        encoder=EncoderState(
            k_ring=(ring,) * enc_l,
            v_ring=(ring,) * enc_l,
            k_scale=(scale,) * enc_l if enc_q else None,
            v_scale=(scale,) * enc_l if enc_q else None,
            slot_pos=P(DATA),
            pending_k=(ring,) * enc_l,
            pending_v=(ring,) * enc_l,
            pending_ks=(scale,) * enc_l if enc_q else None,
            pending_vs=(scale,) * enc_l if enc_q else None,
            pending_sp=P(DATA), pending_adv=P(), write_ctr=P(),
            next_pos=P(DATA)),
        decode=DecodeState(
            k_ring=(ring,) * dec_l,
            v_ring=(ring,) * dec_l,
            k_scale=(scale,) * dec_l if int8 else None,
            v_scale=(scale,) * dec_l if int8 else None,
            slot_pos=P(DATA),
            pending_k=(ring,) * dec_l,
            pending_v=(ring,) * dec_l,
            pending_sp=P(DATA), pending_adv=P(), write_ctr=P(),
            pos=P(DATA), prev_token=P(DATA), done=P(DATA)),
    )


def shard_tree(tree, pspecs, mesh: Mesh):
    # PartitionSpec is tuple-like, so turn specs into NamedSharding leaves
    # first, then zip with the value tree.
    from voxtral_tpu.quant import Quantized
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))

    def put(x, ns):
        if isinstance(x, Quantized):
            # a Quantized weight carries its per-out scale vector: shard it
            # along the same mesh axis as the axis it scales — axis 0 for
            # the embed (quantize_params q_leaf(0)), else the last axis;
            # square weights default to the layer convention (-1)
            spec = ns.spec
            ax = 0 if (x.s.shape[0] == x.q.shape[0]
                       and x.s.shape[0] != x.q.shape[-1]) else -1
            s_ns = NamedSharding(mesh, P(spec[ax]))
            return Quantized(q=jax.device_put(x.q, ns),
                             s=jax.device_put(x.s, s_ns))
        return jax.device_put(x, ns)

    return jax.tree.map(put, tree, shardings,
                        is_leaf=lambda x: isinstance(x, Quantized))


def shard_params(params: dict, cfg: VoxtralConfig, mesh: Mesh) -> dict:
    return shard_tree(params, param_pspecs(cfg), mesh)
