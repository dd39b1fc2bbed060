"""RMSNorm with f32 statistics.

Matches the reference semantics exactly: statistics and the scale multiply are
computed in float32 regardless of input dtype, then cast back
(python_simple_implementation.py:229-237, voxtral_kernels.c:475-492).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """x: [..., D], weight: [D]. Returns same dtype as x."""
    xf = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    out = xf * rms * weight.astype(jnp.float32)
    return out.astype(x.dtype)
