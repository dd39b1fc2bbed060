"""Streaming engine: chunked streaming must produce EXACTLY the batch
pipeline's tokens on a finished stream — the reference's hardest
equivalence invariant (conv tails, stride parity, 4x alignment, ring
caches, prefill gating all have to line up)."""

import numpy as np
import pytest

from voxtral_tpu.models.pipeline import transcribe_tokens_batch
from voxtral_tpu.runtime import StreamConfig, VoxStream


def _stream_tokens(params, cfg, audio, chunk_sizes, interval=2.0, **sc_kw):
    s = VoxStream(params, cfg, tokenizer=None,
                  stream_cfg=StreamConfig(interval=interval, **sc_kw))
    pos, i = 0, 0
    while pos < len(audio):
        n = min(chunk_sizes[i % len(chunk_sizes)], len(audio) - pos)
        s.feed(audio[pos:pos + n])
        pos += n
        i += 1
    s.finish()
    return s.get_ids(), s


@pytest.fixture(scope="module")
def audio():
    rng = np.random.RandomState(21)
    return (rng.randn(3 * 16000) * 0.3).astype(np.float32)


@pytest.fixture(scope="module")
def batch_tokens(tiny_cfg, tiny_params, audio):
    toks, _ = transcribe_tokens_batch(tiny_params, tiny_cfg, audio)
    return [t for t in toks if t >= tiny_cfg.streaming.n_special]


def test_streaming_equals_batch_1s_chunks(tiny_cfg, tiny_params, audio,
                                          batch_tokens):
    ids, s = _stream_tokens(tiny_params, tiny_cfg, audio, [16000])
    assert ids == batch_tokens


def test_streaming_equals_batch_ragged_chunks(tiny_cfg, tiny_params, audio,
                                              batch_tokens):
    ids, _ = _stream_tokens(tiny_params, tiny_cfg, audio,
                            [160, 1280, 7, 4096, 999, 16000])
    assert ids == batch_tokens


def test_streaming_equals_batch_small_interval(tiny_cfg, tiny_params, audio,
                                               batch_tokens):
    """-I 0.1 — hundreds of small encoder calls, exercises ring compaction."""
    ids, s = _stream_tokens(tiny_params, tiny_cfg, audio, [1600],
                            interval=0.1)
    assert ids == batch_tokens


def test_flush_midstream_keeps_stream_open(tiny_cfg, tiny_params, audio):
    s = VoxStream(tiny_params, tiny_cfg,
                  stream_cfg=StreamConfig(interval=2.0))
    s.feed(audio[:32000])
    s.flush()
    early_generated = s.stats()["generated"]
    s.feed(audio[32000:])
    s.finish()
    # flush produced tokens early AND the stream kept decoding afterwards
    # (token IDs themselves are weight-dependent — tiny random weights may
    # greedy-decode only control tokens, so count generated steps)
    assert early_generated > 0
    assert s.stats()["generated"] > early_generated


def test_stats_populated(tiny_cfg, tiny_params, audio):
    _, s = _stream_tokens(tiny_params, tiny_cfg, audio, [16000])
    st = s.stats()
    assert st["audio_s"] == pytest.approx(3.0)
    assert st["generated"] > 0 and st["decoder_ms"] >= 0
