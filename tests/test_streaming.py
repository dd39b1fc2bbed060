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
    """FULL greedy stream from the batch pipeline (text + control): random
    tiny weights can greedy-decode only control tokens, so comparing the
    text-token queues alone would be vacuous."""
    toks, _ = transcribe_tokens_batch(tiny_params, tiny_cfg, audio)
    toks = [int(t) for t in toks]
    assert len(toks) > 10          # comparison below must not be trivial
    return toks


def test_streaming_equals_batch_1s_chunks(tiny_cfg, tiny_params, audio,
                                          batch_tokens):
    _, s = _stream_tokens(tiny_params, tiny_cfg, audio, [16000])
    assert s.generated_ids == batch_tokens


def test_streaming_equals_batch_ragged_chunks(tiny_cfg, tiny_params, audio,
                                              batch_tokens):
    _, s = _stream_tokens(tiny_params, tiny_cfg, audio,
                          [160, 1280, 7, 4096, 999, 16000])
    assert s.generated_ids == batch_tokens


def test_streaming_equals_batch_small_interval(tiny_cfg, tiny_params, audio,
                                               batch_tokens):
    """-I 0.1 — hundreds of small encoder calls, exercises ring compaction."""
    _, s = _stream_tokens(tiny_params, tiny_cfg, audio, [1600],
                          interval=0.1)
    assert s.generated_ids == batch_tokens


def test_streaming_nondefault_delay_matches_batch(tiny_cfg, tiny_params,
                                                  audio):
    """flush()/finish() must pad by the stream's LIVE delay
    (voxtral.c:1645-1648): with delay_tokens=12 the right pad is 23 tokens,
    not the config default's 17 — too little pad silently drops the tail."""
    from voxtral_tpu.models.pipeline import transcribe_tokens_batch
    want, _ = transcribe_tokens_batch(tiny_params, tiny_cfg, audio,
                                      delay_tokens=12)
    _, s = _stream_tokens(tiny_params, tiny_cfg, audio, [16000],
                          delay_tokens=12)
    assert s.generated_ids == [int(t) for t in want]


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


def test_set_delay_matches_fresh_stream(tiny_cfg, tiny_params, audio):
    """set_delay (vox_set_delay, voxtral.c:1681-87) before any audio must be
    equivalent to constructing the stream with that delay: same prompt
    length and same tokens."""
    a = VoxStream(tiny_params, tiny_cfg, stream_cfg=StreamConfig(
        interval=1.0, delay_tokens=12))
    b = VoxStream(tiny_params, tiny_cfg, stream_cfg=StreamConfig(interval=1.0))
    b.set_delay(12 * 80)
    assert list(a.prompt_ids) == list(b.prompt_ids)
    np.testing.assert_allclose(np.asarray(a.t_ada), np.asarray(b.t_ada))
    for s in (a, b):
        s.feed(audio)
        s.finish()
    assert a.get_ids() == b.get_ids()
    # clamping contract: 80..2400 ms
    b2 = VoxStream(tiny_params, tiny_cfg, stream_cfg=StreamConfig())
    b2.set_delay(5000)
    assert b2.sc.delay_tokens == 30
    b2.set_delay(0)
    assert b2.sc.delay_tokens == 1


def test_continuous_watchdog_kv_restart(tiny_cfg, tiny_params, audio):
    """Continuous mode: the KV cap (voxtral.c:412) forces a FULL restart
    and the stream keeps producing (monitor symbol ⟳♻)."""
    import voxtral_tpu.runtime.stream as S
    old = S.MAX_DECODE_KV
    S.MAX_DECODE_KV = 16
    try:
        _, s = _stream_tokens(tiny_params, tiny_cfg, audio, [16000],
                              continuous=True)
    finally:
        S.MAX_DECODE_KV = old
    assert any(sym.startswith("⟳") for sym in s.monitor_log), s.monitor_log
    assert s.n_generated > 16            # kept decoding after restarts
    # KV-cap restarts are full resets (voxtral.c:1210-1213)
    assert all("♻" in sym for sym in s.monitor_log if sym.startswith("⟳"))


def test_continuous_watchdog_nontext_streak(tiny_cfg, tiny_params, audio,
                                            monkeypatch):
    """Continuous mode trigger 3 (voxtral.c:415-417): >= N consecutive
    non-text tokens force a restart; streak restarts are FULL resets
    (trigger >= 2 escalation, voxtral.c:1210-1213)."""
    import voxtral_tpu.runtime.stream as S
    monkeypatch.setattr(S, "MAX_NON_TEXT_STREAK", 4)
    # force every decoded token to classify as non-text so the streak is
    # deterministic regardless of the random weights' argmax choices
    monkeypatch.setattr(S.VoxStream, "_classify", lambda self, t: "control")
    _, s = _stream_tokens(tiny_params, tiny_cfg, audio, [16000],
                          continuous=True)
    streaks = [sym for sym in s.monitor_log if sym.startswith("↯")]
    assert streaks, s.monitor_log
    assert all("♻" in sym for sym in streaks)
    assert s.n_generated > 4                 # kept decoding after restarts


def test_eos_restart_escalation_to_full(tiny_cfg, tiny_params, audio):
    """EOS restarts are decoder-only (✂) until 2 consecutive TEXTLESS
    restarts, then escalate to a full reset (♻) — voxtral.c:1189-1239 +
    empty-restart escalation. A text token in between resets the count."""
    s = VoxStream(tiny_params, tiny_cfg,
                  stream_cfg=StreamConfig(interval=2.0, continuous=True))
    s.feed(audio)                            # decoder live, real state
    assert s.decoder_started

    s.eos_seen = True                        # textless EOS #1
    s._watchdog()
    assert s.monitor_log[-1] == "↺✂" and s.empty_restarts == 1
    assert not s.eos_seen and not s.decoder_started   # decoder was reset

    s.eos_seen = True                        # textless EOS #2 -> escalate
    s._watchdog()
    assert s.monitor_log[-1] == "↺♻" and s.empty_restarts == 0

    s.feed(audio)                            # restart the decoder
    s.text_since_restart = True              # a text token landed
    s.eos_seen = True
    s._watchdog()
    assert s.monitor_log[-1] == "↺✂" and s.empty_restarts == 0


def test_set_continuous(tiny_cfg, tiny_params, audio):
    """vox_stream_set_continuous parity (voxtral.h:306-317): toggling live
    mode on an existing stream enables the watchdog."""
    import voxtral_tpu.runtime.stream as S
    s = VoxStream(tiny_params, tiny_cfg, stream_cfg=StreamConfig(interval=2.0))
    assert not s.sc.continuous
    s.set_continuous(True)
    assert s.sc.continuous
    s.feed(audio)
    s.eos_seen = True
    s._watchdog()                            # fires only in continuous mode
    assert s.monitor_log and s.monitor_log[-1].startswith("↺")
    s.set_continuous(False)
    s.eos_seen = True
    n = len(s.monitor_log)
    s._watchdog()
    assert len(s.monitor_log) == n           # watchdog inert when off


def test_continuous_watchdog_no_decode_timeout(tiny_cfg, tiny_params):
    """Continuous mode: audio fed but no token decoded for the timeout
    window triggers a restart (voxtral.c:1189-1239 trigger 4)."""
    import voxtral_tpu.runtime.stream as S
    old = S.MAX_NO_DECODE_SECONDS
    S.MAX_NO_DECODE_SECONDS = 1
    try:
        s = VoxStream(tiny_params, tiny_cfg,
                      stream_cfg=StreamConfig(interval=60.0,  # encoder gated
                                              continuous=True))
        rng = np.random.RandomState(3)
        for _ in range(3):                   # 3 s fed, encoder never runs
            s.feed((rng.randn(16000) * 0.3).astype(np.float32))
    finally:
        S.MAX_NO_DECODE_SECONDS = old
    assert any(sym.startswith("⌚") for sym in s.monitor_log), s.monitor_log


def test_monitor_decode_symbols(tiny_cfg, tiny_params, audio):
    """--monitor emits the reference's full per-event symbol set
    (README.md:105-130, voxtral.c:942-1181): ⌛ waiting for the prompt,
    ▶ encoder chunk, · prefill, then one decode-batch symbol per decode
    section classified text/control/invalid/EOS with a fast/slow variant."""
    _, s = _stream_tokens(tiny_params, tiny_cfg, audio, [1600],
                          interval=0.1, monitor=True)
    log = s.monitor_log
    # 0.1 s feeds: left pad (256 mel) + first feeds stay under the 312-mel
    # first-chunk gate, so the decoder waits for its prompt
    assert "⌛" in log, log
    assert "▶" in log and "·" in log
    decode_syms = [x for x in log
                   if x and x[0] in "▪▸▫▹✗✘◦"]
    assert decode_syms, log
    # random tiny weights decode control/text tokens, never EOS here;
    # the streak-severity suffix only ever rides control/invalid symbols
    for x in decode_syms:
        if len(x) > 1:
            assert x[1] in "⚠☠" and x[0] in "▫▹✗✘"
    # slow-threshold classification is config-driven: with a 0 ms threshold
    # every decode batch is "slow"
    _, s2 = _stream_tokens(tiny_params, tiny_cfg, audio, [16000],
                           monitor=True, monitor_slow_ms=0.0)
    d2 = [x for x in s2.monitor_log if x and x[0] in "▪▸▫▹✗✘◦"]
    assert d2 and all(x[0] in "▸▹✘◦" for x in d2), s2.monitor_log
