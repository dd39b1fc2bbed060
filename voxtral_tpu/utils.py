"""Small runtime utilities (observability helpers)."""

from __future__ import annotations

import jax


def device_memory_gb(device=None) -> dict:
    """HBM usage of one device in GiB — the TPU analogue of the reference's
    GPU memory gauge (vox_metal_memory_used, voxtral_metal.m:4497, printed
    at load voxtral.c:281-283). Returns {} on backends without stats
    (e.g. CPU)."""
    dev = device or jax.devices()[0]
    try:
        st = dev.memory_stats() or {}
    except Exception:
        return {}
    out = {}
    if "bytes_in_use" in st:
        out["hbm_used_gb"] = round(st["bytes_in_use"] / 2**30, 2)
    if "bytes_limit" in st:
        out["hbm_limit_gb"] = round(st["bytes_limit"] / 2**30, 2)
    return out
