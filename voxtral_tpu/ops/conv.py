"""Causal 1-D convolution with vLLM WhisperCausalConv1d padding semantics.

Padding rule (python_simple_implementation.py:327-338, voxtral_kernels.c:422-469):
left pad = kernel - stride; right "extra" pad aligns the output to
ceil(n_frames). For the Voxtral conv stem (k=3): stride 1 keeps length, stride
2 halves it rounding up (odd input gets one right zero). Lowered through
lax.conv_general_dilated so XLA maps it onto the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def causal_conv_pads(length: int, kernel: int, stride: int) -> tuple[int, int]:
    """(left_pad, right_pad) for an input of `length` frames."""
    padding_total = kernel - stride
    n_frames = (length - kernel + padding_total) / stride + 1
    target_length = (math.ceil(n_frames) - 1) * stride + (kernel - padding_total)
    extra = int(target_length - length)
    return padding_total, extra


def causal_conv_out_len(length: int, kernel: int, stride: int) -> int:
    left, extra = causal_conv_pads(length, kernel, stride)
    return (length + left + extra - kernel) // stride + 1


def causal_conv1d(x: jax.Array, weight: jax.Array, bias: jax.Array,
                  *, stride: int) -> jax.Array:
    """x: [C_in, L]; weight: [K, C_in, C_out] (lane-clean storage);
    bias: [C_out]. Returns [C_out, L'].

    Computed in f32 (conv stem weights stay f32 in every reference mode).
    """
    cin, length = x.shape
    kernel = weight.shape[0]
    left, extra = causal_conv_pads(length, kernel, stride)
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32)[None],                  # [1, C_in, L]
        weight.astype(jnp.float32),                   # [K, C_in, C_out]
        window_strides=(stride,),
        padding=[(left, extra)],
        dimension_numbers=("NCH", "HIO", "NCH"),
        preferred_element_type=jnp.float32,
    )[0]
    return out + bias.astype(jnp.float32)[:, None]
