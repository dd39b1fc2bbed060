"""Greedy-token parity vs the torch reference at REAL 4B dimensions
(dec dim 3072 / hd 128 / GQA 32:8 / vocab 131072; enc dim 1280 / hd 64) —
tiny-config goldens cannot exercise the hd=128 decode path or the
131072-wide argmax. Layer counts are reduced to keep CI fast; the full
26/32-layer run is tools/parity_4b.py (results recorded in SPEED.md).

Skip with VOX_SKIP_4B=1 on memory-constrained machines (needs ~8 GB RAM
for the f32 torch side)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.skipif(os.environ.get("VOX_SKIP_4B") == "1",
                    reason="VOX_SKIP_4B=1")
def test_full_dim_f32_parity_one_layer():
    import parity_4b as p4

    cfg = p4.full_dim_config(enc_layers=1, dec_layers=1)
    report = p4.run(cfg, seconds=0.7, modes=["f32"], seed=77)
    assert report["tokens"] > 4
    assert report["f32"]["exact"], report
