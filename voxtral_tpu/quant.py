"""Q8 quantization: per-output-row symmetric int8 weights.

Format parity with the reference quantizer (quantize.py:34-43): every 2-D
tensor is quantized per safetensors-row (the OUTPUT feature axis) with
scale = amax(row) / 127, stored as int8 values + f32 scales. In our param
tree linear weights live transposed ([in, out]), so scales index the LAST
axis; the tied embedding table stays [vocab, dim] with per-vocab-row scales.

Compute path: XLA TPU (and CPU) supports mixed-dtype dot_general directly —
`dot_general(x_bf16, q_int8, preferred_element_type=f32) * scales` reads one
byte per weight from HBM with no materialized dequantized copy (measured
faster than the bf16 dot at identical shapes). This replaces the reference's
fused Q8 matvec kernels (voxtral_kernels.c:277-312, voxtral_metal_q8.m).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Quantized:
    """Per-row symmetric int8 quantized matrix: w[.., r] ~= q[.., r] * s[r].

    q: int8, scales s: f32 indexing the LAST axis of q ([in, out] linear
    weights -> per-out scales) EXCEPT the embedding table, which is stored
    [vocab, dim] with s indexing axis 0 (set axis=0).
    """
    q: Any            # int8
    s: Any            # f32 [q.shape[axis]]
    axis: int = -1    # which axis of q the scales index

    def tree_flatten(self):
        return (self.q, self.s), self.axis

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):  # for code probing w.dtype; dequantized dtype is f32
        return jnp.float32


def dequantize(w: Quantized) -> jax.Array:
    """Full-precision f32 materialization (load-time/small tensors only)."""
    s = w.s
    if w.axis == -1 or w.axis == w.q.ndim - 1:
        return w.q.astype(jnp.float32) * s
    shape = [1] * w.q.ndim
    shape[w.axis] = -1
    return w.q.astype(jnp.float32) * s.reshape(shape)


def quantize_np(arr: np.ndarray, axis: int = -1) -> Quantized:
    """Numpy quantizer matching the reference (quantize.py:34-43):
    scale = amax/127 per row on `axis`, symmetric round-to-nearest."""
    arr = np.asarray(arr, dtype=np.float32)
    red = tuple(i for i in range(arr.ndim) if i != (axis % arr.ndim))
    amax = np.abs(arr).max(axis=red)
    scales = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    shape = [1] * arr.ndim
    shape[axis % arr.ndim] = -1
    q = np.clip(np.round(arr / scales.reshape(shape)), -127, 127).astype(np.int8)
    return Quantized(q=q, s=scales, axis=axis % arr.ndim if axis != -1 else -1)


def quantize_jax(arr: jax.Array, axis: int = -1) -> Quantized:
    """On-device quantizer (used to Q8-ify synthetic benchmark weights)."""
    a = arr.astype(jnp.float32)
    red = tuple(i for i in range(a.ndim) if i != (axis % a.ndim))
    amax = jnp.max(jnp.abs(a), axis=red)
    scales = jnp.where(amax > 0, amax / 127.0, 1.0)
    shape = [1] * a.ndim
    shape[axis % a.ndim] = -1
    q = jnp.clip(jnp.round(a / scales.reshape(shape)), -127, 127).astype(jnp.int8)
    return Quantized(q=q, s=scales, axis=axis % a.ndim if axis != -1 else -1)


def quantize_kv(x: jax.Array, kv_heads: int, head_dim: int):
    """Quantize a KV block [B, S, kv_heads*head_dim] (float) to the int8
    ring representation: (int8 [B, S, K], scales [B, kv_heads, S] f32 —
    the [B, Hkv, P] layout the fused attention kernel reads).

    Scale is per (stream, slot, kv-head), symmetric amax/127 — the same
    rule as Q8 weights (quantize.py:34-43) applied per cache entry. The
    kernel never dequantizes: K scales multiply score columns, V scales
    fold into probability columns."""
    b, s, _ = x.shape
    x4 = x.astype(jnp.float32).reshape(b, s, kv_heads, head_dim)
    amax = jnp.max(jnp.abs(x4), axis=-1)            # [B, S, Hkv]
    scales = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x4 / scales[..., None]), -127, 127)
    return (q.astype(jnp.int8).reshape(b, s, kv_heads * head_dim),
            jnp.swapaxes(scales, 1, 2))             # [B, Hkv, S]


def quantize_kv_int4(x: jax.Array, kv_heads: int, head_dim: int):
    """Quantize a KV block [B, S, kv_heads*head_dim] (float) to the
    nibble-PACKED int4 ring representation: (int8 [B, S, K/2] with two
    int4 values per byte, scales [B, kv_heads, S] f32).

    Packing convention (halves, no interleave — tools/profile_int4_unpack
    measured interleaved packing as pure VPU relayout loss): for one head
    of hd lanes, packed byte c (c in [0, hd/2)) carries lane c in its low
    nibble and lane c + hd/2 in its high nibble. The kernel unpacks with
    two int32 shifts and runs TWO half-width dots per sub-head (scores:
    q_lo @ lo^T + q_hi @ hi^T), so the original lane order never needs a
    re-interleave. Scale is per (stream, slot, kv-head), amax/7.

    Used for the ENCODER rings only: encoder attention runs once per
    chunk, so the VPU unpack is paid 1x per ~20 decoded tokens — unlike
    the decoder, where per-token unpack measured slower than the DMA it
    saves (SPEED.md int4 rejection). Halving the encoder ring (the
    largest per-stream state item) is what buys the bf16 fleet its extra
    streams."""
    b, s, _ = x.shape
    h2 = head_dim // 2
    x4 = x.astype(jnp.float32).reshape(b, s, kv_heads, head_dim)
    amax = jnp.max(jnp.abs(x4), axis=-1)            # [B, S, Hkv]
    scales = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(x4 / scales[..., None]), -8, 7).astype(jnp.int32)
    lo = q[..., :h2] & 0xF                          # unsigned low nibble
    packed = lo | (q[..., h2:] << 4)                # int32 in [-128, 127]
    return (packed.astype(jnp.int8).reshape(b, s, kv_heads * h2),
            jnp.swapaxes(scales, 1, 2))             # [B, Hkv, S]


def unpack_int4(packed: jax.Array):
    """Inverse nibble split: packed int8 [..., n] -> (lo, hi) int32 signed
    int4 values (lane c, lane c + hd/2 of quantize_kv_int4's convention).
    int32 shifts: int8 shifts don't legalize in Mosaic."""
    xi = packed.astype(jnp.int32)
    hi = jax.lax.shift_right_arithmetic(xi, 4)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(xi, 28), 28)
    return lo, hi


# Param-tree keys carrying the big 2-D matmul weights (per section).
_Q8_LAYER_KEYS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def quantize_params(params: dict) -> dict:
    """Quantize a bf16/f32 param tree to the Q8 inference form: all large
    linear weights + the tied embedding become Quantized; norms, biases,
    conv stem, and ada MLPs stay as-is.

    CONSUMES the input tree: each quantized leaf is donated to its jit call
    (so peak HBM stays ~params + one leaf — required for the 8.8 GB 4B tree
    on a 16 GB chip). Pass a copy if you still need the original."""
    def q_leaf(axis):
        return jax.jit(lambda w: quantize_jax(w, axis), donate_argnums=(0,))

    qw = q_leaf(-1)

    def q_layers(layers):
        return tuple(
            {k: (qw(v) if k in _Q8_LAYER_KEYS else v) for k, v in lp.items()}
            for lp in layers)

    out = {
        "encoder": {**params["encoder"],
                    "layers": q_layers(params["encoder"]["layers"])},
        "adapter": {"w0": qw(params["adapter"]["w0"]),
                    "w1": qw(params["adapter"]["w1"])},
        "decoder": {**params["decoder"],
                    "embed": q_leaf(0)(params["decoder"]["embed"]),
                    "layers": q_layers(params["decoder"]["layers"])},
    }
    return out
