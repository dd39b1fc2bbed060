"""Weight I/O: safetensors reader/writer, param-tree mapping, random init.

TPU-native replacement for the reference's mmap safetensors layer
(voxtral_safetensors.c:157-468): the header is parsed with json, tensor data
is exposed as zero-copy numpy views over a memory map (bf16 via ml_dtypes),
and weights go straight to device HBM in their target dtype with optional
NamedShardings — no f32 detour.

Layout conventions of the param tree:
- Linear weights are stored [in_features, out_features] (x @ w), i.e. the
  transpose of the safetensors [out, in] layout.
- "layers" is a TUPLE of per-layer dicts (NOT stacked along a layer axis):
  on TPU a dot cannot read a slice of a stacked [L, ...] array in place —
  XLA materializes a copy of every layer's weights inside the decode loop
  (+2.8 GiB temp, ~56 GB of extra HBM traffic per chunk). Separate per-layer
  buffers are read by the MXU directly.
- Norm weights, conv stem, and biases stay float32 in every mode (matching
  the reference's precision rules, python_simple_implementation.py:499-513).

The custom "Q8" dtype (quantize.py: per-row symmetric int8, row scales then
int8 data) loads as a `Quantized` leaf pair.
"""

from __future__ import annotations

import dataclasses
import json
import struct
from typing import Any, Callable

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.quant import Quantized  # re-exported; lives in quant.py

ENC_PREFIX = "mm_streams_embeddings.embedding_module.whisper_encoder"
ADA_PREFIX = "mm_streams_embeddings.embedding_module.audio_language_projection"
EMB_NAME = "mm_streams_embeddings.embedding_module.tok_embeddings.weight"

_DTYPES = {
    "F32": np.float32, "F16": np.float16, "BF16": ml_dtypes.bfloat16,
    "I8": np.int8, "I32": np.int32, "I64": np.int64, "F64": np.float64,
    "U8": np.uint8,
}


# ---------------------------------------------------------------------------
# Safetensors file access
# ---------------------------------------------------------------------------

class SafetensorsFile:
    """Zero-copy reader for a safetensors file (plus the custom Q8 dtype)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            raw8 = f.read(8)
            if len(raw8) < 8:
                raise ValueError(f"{path}: truncated safetensors header")
            (hlen,) = struct.unpack("<Q", raw8)
            hraw = f.read(hlen)
            if len(hraw) < hlen:
                raise ValueError(f"{path}: header length {hlen} exceeds file")
            header = json.loads(hraw)
        self.header = {k: v for k, v in header.items() if k != "__metadata__"}
        self.metadata = header.get("__metadata__", {})
        self._data_start = 8 + hlen
        self._mmap = np.memmap(path, dtype=np.uint8, mode="r")
        self._validate_offsets()

    def _validate_offsets(self):
        """Reject truncated/corrupt files up front instead of surfacing an
        opaque reshape error or a silent short view later — the reference
        validates every tensor against the file size at open
        (voxtral_safetensors.c:272-282). Beyond the reference, the byte
        count is also checked against dtype x shape."""
        data_bytes = self._mmap.size - self._data_start
        for name, meta in self.header.items():
            s, e = meta["data_offsets"]
            if not (0 <= s <= e <= data_bytes):
                raise ValueError(
                    f"{self.path}: data out of bounds for {name}: "
                    f"offsets [{s}, {e}) vs {data_bytes} data bytes")
            shape = meta["shape"]
            n = 1
            for d in shape:
                if d < 0:
                    raise ValueError(
                        f"{self.path}: negative dim in shape of {name}")
                n *= d
            if meta["dtype"] == "Q8":
                if len(shape) != 2:
                    raise ValueError(f"{self.path}: Q8 tensor {name} must "
                                     f"be 2-D, got shape {shape}")
                want = 4 * shape[0] + n           # [rows f32 scales][int8]
            elif meta["dtype"] in _DTYPES:
                want = n * np.dtype(_DTYPES[meta["dtype"]]).itemsize
            else:
                raise ValueError(
                    f"{self.path}: unknown dtype {meta['dtype']!r} for {name}")
            if e - s != want:
                raise ValueError(
                    f"{self.path}: size mismatch for {name}: {e - s} bytes "
                    f"vs {want} expected for {meta['dtype']} {shape}")

    def names(self):
        return list(self.header.keys())

    def info(self, name: str):
        return self.header[name]

    def _raw(self, name: str) -> np.ndarray:
        meta = self.header[name]
        s, e = meta["data_offsets"]
        return self._mmap[self._data_start + s:self._data_start + e]

    def tensor(self, name: str) -> np.ndarray:
        """Zero-copy view for standard dtypes; Q8 returns (scales, int8) via
        q8_tensor instead."""
        meta = self.header[name]
        if meta["dtype"] == "Q8":
            raise ValueError(f"{name} is Q8; use q8_tensor()")
        dt = _DTYPES[meta["dtype"]]
        return self._raw(name).view(dt).reshape(meta["shape"])

    def q8_tensor(self, name: str):
        """Q8 layout (quantize.py:34-43): [rows f32 scales][rows*cols int8]."""
        meta = self.header[name]
        rows, cols = meta["shape"]
        raw = self._raw(name)
        scales = raw[:4 * rows].view(np.float32)
        q = raw[4 * rows:4 * rows + rows * cols].view(np.int8).reshape(rows, cols)
        return scales, q

    def tensor_f32(self, name: str) -> np.ndarray:
        meta = self.header[name]
        if meta["dtype"] == "Q8":
            scales, q = self.q8_tensor(name)
            return q.astype(np.float32) * scales[:, None]
        return self.tensor(name).astype(np.float32)

    def is_q8(self, name: str) -> bool:
        return self.header[name]["dtype"] == "Q8"


def save_safetensors(path: str, tensors: dict[str, np.ndarray],
                     metadata: dict | None = None) -> None:
    """Writer used by tests, the quantizer, and checkpoint tooling."""
    rev = {np.dtype(v): k for k, v in _DTYPES.items()}
    header: dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = metadata
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        if isinstance(arr, tuple):  # ("Q8", scales, q, shape)
            tag, scales, q, shape = arr
            blob = scales.astype(np.float32).tobytes() + q.astype(np.int8).tobytes()
            header[name] = {"dtype": "Q8", "shape": list(shape),
                            "data_offsets": [offset, offset + len(blob)]}
        else:
            arr = np.ascontiguousarray(arr)
            blob = arr.tobytes()
            header[name] = {"dtype": rev[arr.dtype], "shape": list(arr.shape),
                            "data_offsets": [offset, offset + len(blob)]}
        blobs.append(blob)
        offset += len(blob)
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)


# ---------------------------------------------------------------------------
# Name schema
# ---------------------------------------------------------------------------

def encoder_layer_names(i: int) -> dict[str, tuple[str, bool]]:
    """tree key -> (tensor name, transpose?) for encoder layer i."""
    lp = f"{ENC_PREFIX}.transformer.layers.{i}"
    return {
        "attn_norm": (f"{lp}.attention_norm.weight", False),
        "wq": (f"{lp}.attention.wq.weight", True),
        "wq_b": (f"{lp}.attention.wq.bias", False),
        "wk": (f"{lp}.attention.wk.weight", True),
        "wv": (f"{lp}.attention.wv.weight", True),
        "wv_b": (f"{lp}.attention.wv.bias", False),
        "wo": (f"{lp}.attention.wo.weight", True),
        "wo_b": (f"{lp}.attention.wo.bias", False),
        "ffn_norm": (f"{lp}.ffn_norm.weight", False),
        "w1": (f"{lp}.feed_forward.w1.weight", True),
        "w2": (f"{lp}.feed_forward.w2.weight", True),
        "w2_b": (f"{lp}.feed_forward.w2.bias", False),
        "w3": (f"{lp}.feed_forward.w3.weight", True),
    }


def decoder_layer_names(i: int) -> dict[str, tuple[str, bool]]:
    lp = f"layers.{i}"
    return {
        "attn_norm": (f"{lp}.attention_norm.weight", False),
        "wq": (f"{lp}.attention.wq.weight", True),
        "wk": (f"{lp}.attention.wk.weight", True),
        "wv": (f"{lp}.attention.wv.weight", True),
        "wo": (f"{lp}.attention.wo.weight", True),
        "ffn_norm": (f"{lp}.ffn_norm.weight", False),
        "w1": (f"{lp}.feed_forward.w1.weight", True),
        "w2": (f"{lp}.feed_forward.w2.weight", True),
        "w3": (f"{lp}.feed_forward.w3.weight", True),
        "ada_down": (f"{lp}.ada_rms_norm_t_cond.0.weight", True),
        "ada_up": (f"{lp}.ada_rms_norm_t_cond.2.weight", True),
    }


# Tree keys that stay f32 regardless of param_dtype
_F32_KEYS = {"attn_norm", "ffn_norm", "wq_b", "wv_b", "wo_b", "w2_b",
             "ada_down", "ada_up"}


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def _get(sf: SafetensorsFile, name: str, transpose: bool, dtype) -> np.ndarray | Quantized:
    if sf.is_q8(name):
        scales, q = sf.q8_tensor(name)
        if transpose:
            # safetensors rows ([out]) become our columns; scales index out.
            return Quantized(q=np.ascontiguousarray(q.T), s=np.asarray(scales))
        # untransposed (embedding table): scales index axis 0 (vocab rows)
        return Quantized(q=np.asarray(q), s=np.asarray(scales), axis=0)
    arr = sf.tensor(name)
    if transpose:
        arr = arr.T
    return np.ascontiguousarray(arr).astype(dtype, copy=False)


def load_params(path: str, cfg: VoxtralConfig, *, device_put: bool = True,
                shardings=None) -> dict:
    """Load the full Voxtral param tree from a consolidated safetensors file.

    shardings: optional pytree (same structure) of jax.sharding.Sharding for
    direct sharded HBM placement.
    """
    sf = SafetensorsFile(path)
    dt = np.dtype(jnp.dtype(cfg.param_dtype).name) if cfg.param_dtype != jnp.bfloat16 \
        else np.dtype(ml_dtypes.bfloat16)

    def leaf_dtype(key):
        return np.float32 if key in _F32_KEYS else dt

    def layer_list(layer_names_fn, n_layers):
        return tuple(
            {key: _get(sf, name, transpose, leaf_dtype(key))
             for key, (name, transpose) in layer_names_fn(i).items()}
            for i in range(n_layers))

    def conv_w(name):
        # stored [K, I, O]: a trailing K=3 axis would be lane-padded to 128
        # on TPU (~40x HBM blowup for conv1); [K, I, O] is layout-clean.
        return np.ascontiguousarray(sf.tensor_f32(name).transpose(2, 1, 0))

    params = {
        "encoder": {
            "conv0_w": conv_w(f"{ENC_PREFIX}.conv_layers.0.conv.weight"),
            "conv0_b": sf.tensor_f32(f"{ENC_PREFIX}.conv_layers.0.conv.bias"),
            "conv1_w": conv_w(f"{ENC_PREFIX}.conv_layers.1.conv.weight"),
            "conv1_b": sf.tensor_f32(f"{ENC_PREFIX}.conv_layers.1.conv.bias"),
            "layers": layer_list(encoder_layer_names, cfg.encoder.layers),
            "norm": sf.tensor_f32(f"{ENC_PREFIX}.transformer.norm.weight"),
        },
        "adapter": {
            "w0": _get(sf, f"{ADA_PREFIX}.0.weight", True, dt),
            "w1": _get(sf, f"{ADA_PREFIX}.2.weight", True, dt),
        },
        "decoder": {
            "embed": _get(sf, EMB_NAME, False, dt),
            "layers": layer_list(decoder_layer_names, cfg.decoder.layers),
            "norm": sf.tensor_f32("norm.weight"),
        },
    }
    if device_put:
        if shardings is None:
            params = jax.tree.map(jnp.asarray, params)
        else:
            params = jax.tree.map(
                lambda leaf, s: jax.device_put(jnp.asarray(leaf), s),
                params, shardings)
    return params


# ---------------------------------------------------------------------------
# Random init (tests + synthetic benchmarks; value-independent performance)
# ---------------------------------------------------------------------------

def random_params(cfg: VoxtralConfig, seed: int = 0, scale: float = 0.02,
                  numpy_out: bool = False) -> dict:
    """Structurally exact random param tree. Used by tests (tiny config) and
    by the benchmark harness (full 4B, since real weights are external)."""
    rng = np.random.RandomState(seed)
    e, d, a = cfg.encoder, cfg.decoder, cfg

    def r(*shape, dt=None):
        arr = (rng.randn(*shape) * scale).astype(np.float32)
        target = dt or cfg.param_dtype
        if not numpy_out:
            return jnp.asarray(arr, dtype=target)
        return arr if target == np.float32 or target == jnp.float32 else \
            arr.astype(ml_dtypes.bfloat16)

    def f32(*shape, const=None):
        if const is not None:
            arr = np.full(shape, const, dtype=np.float32)
            return arr if numpy_out else jnp.asarray(arr)
        return r(*shape, dt=jnp.float32)

    L, D, A, H = e.layers, e.dim, e.attn_dim, e.hidden
    # Norm weights get small random perturbation around 1 so tests catch
    # misapplied norms; biases small random so tests catch dropped biases.
    enc_layers = tuple({
        "attn_norm": f32(D, const=1.0) + r(D, dt=jnp.float32),
        "ffn_norm": f32(D, const=1.0) + r(D, dt=jnp.float32),
        "wq": r(D, A), "wq_b": r(A, dt=jnp.float32), "wk": r(D, A),
        "wv": r(D, A), "wv_b": r(A, dt=jnp.float32),
        "wo": r(A, D), "wo_b": r(D, dt=jnp.float32),
        "w1": r(D, H), "w2": r(H, D), "w2_b": r(D, dt=jnp.float32),
        "w3": r(D, H),
    } for _ in range(L))

    Ld, Dd, Qd, Kd, Hd = d.layers, d.dim, d.q_dim, d.kv_dim, d.hidden
    dec_layers = tuple({
        "attn_norm": f32(Dd, const=1.0) + r(Dd, dt=jnp.float32),
        "ffn_norm": f32(Dd, const=1.0) + r(Dd, dt=jnp.float32),
        "wq": r(Dd, Qd), "wk": r(Dd, Kd), "wv": r(Dd, Kd),
        "wo": r(Qd, Dd), "w1": r(Dd, Hd), "w2": r(Hd, Dd),
        "w3": r(Dd, Hd),
        "ada_down": r(Dd, d.ada_dim, dt=jnp.float32),
        "ada_up": r(d.ada_dim, Dd, dt=jnp.float32),
    } for _ in range(Ld))
    return {
        "encoder": {
            "conv0_w": r(e.conv_kernel, cfg.audio.mel_bins, D, dt=jnp.float32),
            "conv0_b": r(D, dt=jnp.float32),
            "conv1_w": r(e.conv_kernel, D, D, dt=jnp.float32),
            "conv1_b": r(D, dt=jnp.float32),
            "layers": enc_layers,
            "norm": f32(D, const=1.0) + r(D, dt=jnp.float32),
        },
        "adapter": {"w0": r(cfg.adapter_in, cfg.adapter_hidden),
                    "w1": r(cfg.adapter_hidden, Dd)},
        "decoder": {"embed": r(d.vocab_size, Dd),
                    "layers": dec_layers,
                    "norm": f32(Dd, const=1.0) + r(Dd, dt=jnp.float32)},
    }


def param_shapes(cfg: VoxtralConfig) -> dict:
    """Pytree of jax.ShapeDtypeStruct describing the param tree."""
    e, d = cfg.encoder, cfg.decoder
    pd, f32 = cfg.param_dtype, jnp.float32

    def s(shape, dt):
        return jax.ShapeDtypeStruct(shape, dt)

    L, D, A, H = e.layers, e.dim, e.attn_dim, e.hidden
    Ld, Dd, Qd, Kd, Hd = d.layers, d.dim, d.q_dim, d.kv_dim, d.hidden
    enc_layer = {
        "attn_norm": s((D,), f32), "ffn_norm": s((D,), f32),
        "wq": s((D, A), pd), "wq_b": s((A,), f32),
        "wk": s((D, A), pd),
        "wv": s((D, A), pd), "wv_b": s((A,), f32),
        "wo": s((A, D), pd), "wo_b": s((D,), f32),
        "w1": s((D, H), pd), "w2": s((H, D), pd),
        "w2_b": s((D,), f32), "w3": s((D, H), pd),
    }
    dec_layer = {
        "attn_norm": s((Dd,), f32), "ffn_norm": s((Dd,), f32),
        "wq": s((Dd, Qd), pd), "wk": s((Dd, Kd), pd),
        "wv": s((Dd, Kd), pd), "wo": s((Qd, Dd), pd),
        "w1": s((Dd, Hd), pd), "w2": s((Hd, Dd), pd),
        "w3": s((Dd, Hd), pd),
        "ada_down": s((Dd, d.ada_dim), f32),
        "ada_up": s((d.ada_dim, Dd), f32),
    }
    return {
        "encoder": {
            "conv0_w": s((e.conv_kernel, cfg.audio.mel_bins, D), f32),
            "conv0_b": s((D,), f32),
            "conv1_w": s((e.conv_kernel, D, D), f32), "conv1_b": s((D,), f32),
            "layers": tuple(dict(enc_layer) for _ in range(L)),
            "norm": s((D,), f32),
        },
        "adapter": {"w0": s((cfg.adapter_in, cfg.adapter_hidden), pd),
                    "w1": s((cfg.adapter_hidden, Dd), pd)},
        "decoder": {
            "embed": s((d.vocab_size, Dd), pd),
            "layers": tuple(dict(dec_layer) for _ in range(Ld)),
            "norm": s((Dd,), f32),
        },
    }


def random_params_device(cfg: VoxtralConfig, seed: int = 0,
                         scale: float = 0.02, shardings=None) -> dict:
    """Random params generated ON DEVICE (no host materialization) — used by
    synthetic benchmarks at full 4B size. Norm weights init to 1."""
    shapes = param_shapes(cfg)
    leaves, treedef = jax.tree.flatten(shapes)

    def make_all(key):
        keys = jax.random.split(key, len(leaves))
        return [(jax.random.normal(k, l.shape, jnp.float32)
                 * scale).astype(l.dtype) for k, l in zip(keys, leaves)]

    out_shardings = (jax.tree.flatten(shardings)[0]
                     if shardings is not None else None)
    fn = (jax.jit(make_all, out_shardings=out_shardings)
          if out_shardings is not None else jax.jit(make_all))
    out = fn(jax.random.PRNGKey(seed))
    params = jax.tree.unflatten(treedef, out)
    # norm weights ~1 for sane activations
    for sec in ("encoder", "decoder"):
        params[sec]["layers"] = tuple(
            {**lp, "attn_norm": lp["attn_norm"] + 1.0,
             "ffn_norm": lp["ffn_norm"] + 1.0}
            for lp in params[sec]["layers"])
        params[sec]["norm"] = params[sec]["norm"] + 1.0
    return params


def params_to_safetensors(params: dict, cfg: VoxtralConfig, path: str) -> None:
    """Export a param tree back to reference-layout safetensors (test helper:
    lets the torch ground-truth implementation consume our random weights)."""
    t: dict[str, np.ndarray] = {}
    enc, dec, ada = params["encoder"], params["decoder"], params["adapter"]

    def put(name, arr, transpose):
        arr = np.asarray(jax.device_get(arr), dtype=np.float32)
        t[name] = arr.T if transpose else arr

    def put_conv(name, arr):
        a = np.asarray(jax.device_get(arr), dtype=np.float32)
        t[name] = np.ascontiguousarray(a.transpose(2, 1, 0))  # [K,I,O]->[O,I,K]

    put_conv(f"{ENC_PREFIX}.conv_layers.0.conv.weight", enc["conv0_w"])
    put(f"{ENC_PREFIX}.conv_layers.0.conv.bias", enc["conv0_b"], False)
    put_conv(f"{ENC_PREFIX}.conv_layers.1.conv.weight", enc["conv1_w"])
    put(f"{ENC_PREFIX}.conv_layers.1.conv.bias", enc["conv1_b"], False)
    for i in range(cfg.encoder.layers):
        for key, (name, transpose) in encoder_layer_names(i).items():
            put(name, enc["layers"][i][key], transpose)
    put(f"{ENC_PREFIX}.transformer.norm.weight", enc["norm"], False)
    put(f"{ADA_PREFIX}.0.weight", ada["w0"], True)
    put(f"{ADA_PREFIX}.2.weight", ada["w1"], True)
    put(EMB_NAME, dec["embed"], False)
    for i in range(cfg.decoder.layers):
        for key, (name, transpose) in decoder_layer_names(i).items():
            put(name, dec["layers"][i][key], transpose)
    put("norm.weight", dec["norm"], False)
    save_safetensors(path, t)
