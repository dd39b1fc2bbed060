"""End-to-end batch pipeline parity: audio in, identical greedy tokens out."""

import numpy as np

from conftest import load_fixture
from voxtral_tpu.models.pipeline import transcribe_tokens_batch


def test_pipeline_tokens_match_reference(tiny_cfg, tiny_params):
    g = load_fixture("pipeline.npz")
    tokens, _ = transcribe_tokens_batch(tiny_params, tiny_cfg, g["audio"])
    ref = list(g["tokens"])
    # our pipeline stops at the first EOS and strips it, per the reference
    # transcribe() schedule (python_simple_implementation.py:836-855)
    if 2 in ref:
        ref = ref[:ref.index(2)]
    assert tokens == ref
