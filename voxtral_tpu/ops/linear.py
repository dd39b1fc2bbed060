"""Linear / embedding ops that dispatch on weight representation.

Every matmul in the model goes through `linear`, so the Q8 path (weights as
`Quantized` int8 + per-out-row scales) is a pure data change: no model code
forks. The quantized dot keeps int8 operands in HBM (one byte per weight —
the whole point; see quant.py) with f32 MXU accumulation, then applies the
row scales to the f32 result. Replaces the reference's dtype-dispatching
vox_linear family (voxtral_kernels.h:18-84) and Q8 Metal kernels
(voxtral_metal_q8.m).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from voxtral_tpu.quant import Quantized


def linear(x: jax.Array, w, bias=None) -> jax.Array:
    """x: [..., in] @ w: [in, out] (+ bias) -> [..., out] in x.dtype.

    w may be a jax.Array (any float dtype) or Quantized (int8 + scales on
    the out axis)."""
    if isinstance(w, Quantized):
        y = jax.lax.dot_general(
            x, w.q, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = (y * w.s).astype(x.dtype)
    else:
        y = x @ w
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def embed_lookup(embed, ids: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Tied-embedding row gather: ids [...] -> [..., dim] in `dtype`."""
    if isinstance(embed, Quantized):
        rows = embed.q[ids].astype(dtype)
        return rows * embed.s[ids].astype(dtype)[..., None]
    return embed[ids].astype(dtype)


def embed_logits(h: jax.Array, embed) -> jax.Array:
    """Tied-embedding logits: h [..., dim] @ embed[vocab, dim].T -> f32
    [..., vocab]. Operands stay in storage dtype with f32 MXU accumulation —
    an astype(f32) of the 131072x3072 table would materialize a 1.6 GB copy
    per decode step (voxtral_decoder.c:765-779 computes the same product)."""
    if isinstance(embed, Quantized):
        y = jax.lax.dot_general(
            h, embed.q, dimension_numbers=(((h.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y * embed.s
    return jax.lax.dot_general(
        h.astype(embed.dtype), embed,
        dimension_numbers=(((h.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
