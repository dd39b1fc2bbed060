"""Audio-language adapter: 4x downsample reshape + 2-layer MLP.

Reference: vox_adapter_forward (voxtral_encoder.c:699-737),
python_simple_implementation.py:446-463. No biases, exact GELU between the
two projections, no output normalization.
"""

from __future__ import annotations

import jax

from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.ops.linear import linear


def adapter_forward(ada_params: dict, cfg: VoxtralConfig,
                    enc_out: jax.Array) -> jax.Array:
    """enc_out: [S, enc_dim] with S % downsample == 0 -> [S/ds, dec_dim]."""
    s, d = enc_out.shape
    ds = cfg.downsample
    x = enc_out.reshape(s // ds, d * ds)
    x = jax.nn.gelu(linear(x, ada_params["w0"]), approximate=False)
    return linear(x, ada_params["w1"])
