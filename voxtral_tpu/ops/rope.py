"""Interleaved (GPT-J style) rotary position embeddings.

Both the encoder and decoder use is_neox_style=False RoPE: consecutive element
pairs (2j, 2j+1) of each head form a rotation pair. Mistral's safetensors
already store Q/K in interleaved layout, so no weight permutation is applied
anywhere (python_simple_implementation.py:249-275 and :552-559; MODEL.md
"interleaved RoPE" notes). Angle math is done in float32 for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_angles(positions: jax.Array, head_dim: int, theta: float):
    """positions: [...] int array. Returns (cos, sin) each [..., head_dim//2] f32."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv_freq = 1.0 / (theta ** exponents)                     # [hd/2]
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [..., S, H, hd]; cos/sin: [..., S, hd//2] (broadcast over heads).

    Rotation is computed in f32 and cast back to x.dtype.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    *lead, s, h, hd = xf.shape
    xp = xf.reshape(*lead, s, h, hd // 2, 2)
    x_even = xp[..., 0]
    x_odd = xp[..., 1]
    c = cos[..., :, None, :]   # [..., S, 1, hd/2]
    si = sin[..., :, None, :]
    o_even = x_even * c - x_odd * si
    o_odd = x_odd * c + x_even * si
    out = jnp.stack([o_even, o_odd], axis=-1).reshape(*lead, s, h, hd)
    return out.astype(orig_dtype)
