"""Greedy-token parity vs the torch reference at REAL 4B dimensions
(dec dim 3072 / hd 128 / GQA 32:8 / vocab 131072; enc dim 1280 / hd 64) —
tiny-config goldens cannot exercise the hd=128 decode path or the
131072-wide argmax. Layer counts are reduced to keep CI fast; the full
26/32-layer run is tools/parity_4b.py (results recorded in SPEED.md).

Each case runs tools/parity_4b.py in a SUBPROCESS: the torch oracle +
multi-GB f32 trees contaminate the long-running pytest process (an XLA
CPU compile segfault was traced to in-process state after the 4B section,
round 5) — isolation also frees the memory deterministically.

Skip with VOX_SKIP_4B=1 on memory-constrained machines (needs ~8 GB RAM
for the f32 torch side)."""

import ast
import os
import subprocess
import sys

import pytest

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "parity_4b.py")

pytestmark = pytest.mark.skipif(os.environ.get("VOX_SKIP_4B") == "1",
                                reason="VOX_SKIP_4B=1")


def run_parity(env_overrides, timeout=2700):
    env = {**os.environ, **env_overrides}
    p = subprocess.run([sys.executable, TOOL], capture_output=True,
                       text=True, env=env, timeout=timeout)
    assert p.returncode == 0, (p.returncode, p.stderr[-2000:])
    line = next(ln for ln in p.stdout.splitlines()
                if ln.startswith("PARITY_4B "))
    return ast.literal_eval(line[len("PARITY_4B "):])


def test_full_dim_f32_parity_one_layer():
    report = run_parity({
        "VOX_4B_ENC_LAYERS": "1", "VOX_4B_DEC_LAYERS": "1",
        "VOX_4B_SECONDS": "0.7", "VOX_4B_SEED": "77",
        "VOX_4B_MODES": "f32"})
    assert report["tokens"] > 4
    assert report["f32"]["exact"], report


def test_full_dim_ring_wrap_serving_exact():
    """Decoder ring WRAP at real 4B dims (VERDICT r4 missing #4): window
    64 / ring 96 with a 13 s clip decodes ~174 positions — past the padded
    120-slot ring — through the full FleetManager serving path in f32 +
    float-KV bit-parity mode. The wrap + pending-fold + logical-position-
    mask + forced-replay machinery must match the torch reference (which
    windows at 64 too, python_simple_implementation.py:573-578) EXACTLY;
    quantization near-ties can't mask or mimic a state bug here. The
    quantized serving configs' quality at these dims is pinned by the
    26-layer serving/serving_int4 runs (SPEED.md, exact 36/36); the
    standalone wrap + prefix-bucket-switch runs (ring 384, 324 tokens) are
    recorded in SPEED.md round 5."""
    report = run_parity({
        "VOX_4B_ENC_LAYERS": "1", "VOX_4B_DEC_LAYERS": "1",
        "VOX_4B_DEC_WINDOW": "64", "VOX_4B_DEC_RING": "96",
        "VOX_4B_SECONDS": "13", "VOX_4B_SEED": "78",
        "VOX_4B_MODES": "serving_float"})
    assert report["tokens"] > 140          # well past the 120-slot ring
    assert report["serving_float"]["exact"], report
