"""FleetManager: per-stream isolation on shared batched state.

The load-bearing invariants:
- a stream served alone produces the same tokens as the same audio served
  in a busy fleet (masking + logical-position rings keep slots independent);
- a stream ATTACHED MID-FLIGHT (forced prompt replay inside a live fleet)
  still matches its solo run;
- watchdog restarts fire and the stream keeps producing.
"""

import numpy as np
import pytest

from voxtral_tpu.runtime.manager import FleetManager


def _audio(seed, seconds=3.0):
    rng = np.random.RandomState(seed)
    return (rng.randn(int(seconds * 16000)) * 0.3).astype(np.float32)


def _serve(mgr, feeds):
    """feeds: {sid: np.ndarray}. Feed 1 s chunks round-robin, finish, drain."""
    bufs = {sid: a for sid, a in feeds.items()}
    pos = {sid: 0 for sid in feeds}
    while any(pos[sid] < len(a) for sid, a in bufs.items()):
        for sid, a in bufs.items():
            if pos[sid] < len(a):
                mgr.feed(sid, a[pos[sid]:pos[sid] + 16000])
                pos[sid] += 16000
        mgr.poll()
    for sid in feeds:
        mgr.finish(sid)
    # drain all finishing chunks
    for _ in range(64):
        if all(mgr.is_finished(sid) for sid in feeds):
            break
        mgr.poll()
    # compare the FULL greedy stream (text + control): tiny random weights
    # may emit only control tokens, which would make a text-queue-only
    # comparison vacuous
    return {sid: list(mgr.slots[sid].all_ids) for sid in feeds}


def _solo_tokens(params, cfg, audio):
    mgr = FleetManager(params, cfg, batch=1, chunk_tokens=8,
                       dec_ring=256, continuous=True)
    sid = mgr.attach()
    return _serve(mgr, {sid: audio})[sid]


def test_two_streams_match_solo(tiny_cfg, tiny_params):
    a0, a1 = _audio(1), _audio(2, seconds=2.0)
    solo0 = _solo_tokens(tiny_params, tiny_cfg, a0)
    solo1 = _solo_tokens(tiny_params, tiny_cfg, a1)

    mgr = FleetManager(tiny_params, tiny_cfg, batch=2, chunk_tokens=8,
                       dec_ring=256, continuous=True)
    s0, s1 = mgr.attach(), mgr.attach()
    got = _serve(mgr, {s0: a0, s1: a1})
    assert got[s0] == solo0
    assert got[s1] == solo1


def test_mid_flight_attach_matches_solo(tiny_cfg, tiny_params):
    a0, a1 = _audio(3, seconds=4.0), _audio(4, seconds=2.0)
    solo1 = _solo_tokens(tiny_params, tiny_cfg, a1)

    mgr = FleetManager(tiny_params, tiny_cfg, batch=2, chunk_tokens=8,
                       dec_ring=256, continuous=True)
    s0 = mgr.attach()
    # run stream 0 alone for 2 s
    mgr.feed(s0, a0[:32000])
    mgr.poll()
    # now attach stream 1 mid-flight (forced prompt replay in live fleet)
    s1 = mgr.attach()
    got = _serve(mgr, {s0: a0[32000:], s1: a1})
    assert got[s1] == solo1


def test_watchdog_kv_restart_keeps_stream_alive(tiny_cfg, tiny_params):
    import voxtral_tpu.runtime.manager as M
    audio = _audio(5, seconds=4.0)
    old = M.MAX_DECODE_KV
    M.MAX_DECODE_KV = 40           # force restarts well within the clip
    try:
        mgr = FleetManager(tiny_params, tiny_cfg, batch=1, chunk_tokens=8,
                           dec_ring=256, continuous=True)
        sid = mgr.attach()
        _serve(mgr, {sid: audio})
        st = mgr.stats()
        assert st["restarts"] >= 1
        assert st["generated"] > 0
        assert not np.isnan(st["generated"])
    finally:
        M.MAX_DECODE_KV = old


def test_fleet_full_raises(tiny_cfg, tiny_params):
    mgr = FleetManager(tiny_params, tiny_cfg, batch=1, chunk_tokens=8,
                       dec_ring=256)
    mgr.attach()
    with pytest.raises(RuntimeError):
        mgr.attach()


def test_alt_tokens_surface(tiny_cfg, tiny_params):
    mgr = FleetManager(tiny_params, tiny_cfg, batch=1, chunk_tokens=8,
                       dec_ring=256, n_alt=4, alt_cutoff=1.0)
    sid = mgr.attach()
    got = _serve(mgr, {sid: _audio(6, seconds=2.0)})
    # with cutoff=1.0 every text token carries an alt list (possibly empty)
    for entry in got[sid]:
        pass  # get() strips to ids in _serve; direct queue check below
    mgr2 = FleetManager(tiny_params, tiny_cfg, batch=1, chunk_tokens=8,
                        dec_ring=256, n_alt=4, alt_cutoff=1.0)
    s2 = mgr2.attach()
    a = _audio(6, seconds=2.0)
    for i in range(0, len(a), 16000):
        mgr2.feed(s2, a[i:i + 16000])
    mgr2.poll()
    for entry in mgr2.get(s2):
        assert len(entry) == 3          # (id, piece, alts)
        tid, piece, alts = entry
        assert isinstance(alts, list)


def test_nondefault_delay_matches_batch(tiny_cfg, tiny_params):
    """delay_tokens=12 needs a (12+1+10)-token right pad — finish() must
    compute it from the LIVE delay (voxtral.c:1645-1648), else the last
    ~0.5 s of tokens never drain."""
    from voxtral_tpu.models.pipeline import transcribe_tokens_batch
    audio = _audio(13, seconds=2.0)
    want = [int(t) for t in transcribe_tokens_batch(
        tiny_params, tiny_cfg, audio, delay_tokens=12)[0]]

    mgr = FleetManager(tiny_params, tiny_cfg, batch=1, chunk_tokens=8,
                       dec_ring=256, continuous=False, delay_tokens=12)
    sid = mgr.attach()
    mgr.feed(sid, audio)
    mgr.finish(sid)
    for _ in range(64):
        if mgr.is_finished(sid):
            break
        mgr.poll()
    assert mgr.is_finished(sid)
    assert list(mgr.slots[sid].all_ids) == want


def test_no_text_watchdog_clock_resets(tiny_cfg, tiny_params):
    """After a no-text full restart the watchdog clock must restart too
    (voxtral.c:1237) — else a silent stream full-restarts on every chunk
    forever, re-prepending the left pad each time (livelock, growing buf)."""
    import voxtral_tpu.runtime.manager as M
    audio = _audio(14, seconds=4.0)
    old = M.MAX_NO_TEXT_SECONDS
    M.MAX_NO_TEXT_SECONDS = 0.5      # random weights emit no text tokens
    try:
        mgr = FleetManager(tiny_params, tiny_cfg, batch=1, chunk_tokens=8,
                           dec_ring=256, continuous=True)
        sid = mgr.attach()
        for i in range(0, len(audio), 16000):   # 1 s per feed > 0.5 s cap
            mgr.feed(sid, audio[i:i + 16000])
            for _ in range(24):      # bounded drain (a livelock re-buffers
                if len(mgr.slots[sid].buf) < mgr.chunk_samp:
                    break            # the left pad forever and never drains)
                mgr.poll()
        assert len(mgr.slots[sid].buf) < mgr.chunk_samp, \
            "silent-stream restart livelock (buf keeps growing)"
        assert mgr.stats()["restarts"] >= 2
    finally:
        M.MAX_NO_TEXT_SECONDS = old


def test_finished_stream_matches_batch_pipeline(tiny_cfg, tiny_params):
    """A finished non-continuous manager stream must reproduce the batch
    pipeline's greedy tokens EXACTLY — including the tail: finish() caps
    emission at the exact right-pad schedule, so the chunk-fill padding
    the fleet needs for fixed shapes is invisible in the output."""
    from voxtral_tpu.models.pipeline import transcribe_tokens_batch
    audio = _audio(9, seconds=2.7)    # deliberately not chunk-aligned
    want = [int(t) for t in
            transcribe_tokens_batch(tiny_params, tiny_cfg, audio)[0]]

    mgr = FleetManager(tiny_params, tiny_cfg, batch=2, chunk_tokens=8,
                       dec_ring=256, continuous=False)
    sid = mgr.attach()
    mgr.feed(sid, audio)
    mgr.finish(sid)
    for _ in range(64):
        if mgr.is_finished(sid):
            break
        mgr.poll()
    assert mgr.is_finished(sid)
    assert list(mgr.slots[sid].all_ids) == want


def test_s16_wire_matches_f32(tiny_cfg, tiny_params):
    """wire_dtype='s16' ships PCM as int16 and converts on device — exact
    for s16-origin audio (every WAV/mic sample), so tokens must bit-match
    the f32 wire."""
    rng = np.random.RandomState(7)
    s16 = (rng.randn(3 * 16000) * 0.25 * 32768).clip(-32768, 32767)
    s16 = s16.astype(np.int16)
    audio = s16.astype(np.float32) / 32768.0

    want = _solo_tokens(tiny_params, tiny_cfg, audio)
    mgr = FleetManager(tiny_params, tiny_cfg, batch=1, chunk_tokens=8,
                       dec_ring=256, continuous=True, wire_dtype="s16")
    sid = mgr.attach()
    got = _serve(mgr, {sid: audio})[sid]
    assert got == want


def test_restart_with_staged_chunk_pushback(tiny_cfg, tiny_params):
    """Pipelined poll(): a watchdog restart discovered while the next chunk
    is already staged must push the samples back (and re-project replay)
    such that staging depth is invisible — feeding the whole clip up front
    (deep staging, restarts always hit a staged chunk) produces exactly the
    tokens of feeding it in small pieces (shallow staging)."""
    import voxtral_tpu.runtime.manager as M
    audio = _audio(11, seconds=4.0)
    old = M.MAX_DECODE_KV
    M.MAX_DECODE_KV = 24            # restart every ~3 chunks
    try:
        def run(feed_piece):
            mgr = FleetManager(tiny_params, tiny_cfg, batch=1,
                               chunk_tokens=8, dec_ring=256, continuous=True)
            sid = mgr.attach()
            for i in range(0, len(audio), feed_piece):
                mgr.feed(sid, audio[i:i + feed_piece])
                mgr.poll()
            mgr.finish(sid)
            for _ in range(64):
                if mgr.is_finished(sid):
                    break
                mgr.poll()
            assert mgr.stats()["restarts"] >= 1
            return list(mgr.slots[sid].all_ids)

        deep = run(len(audio))         # everything buffered -> deep staging
        shallow = run(12000)           # ~1 chunk per poll
    finally:
        M.MAX_DECODE_KV = old
    assert deep == shallow


def test_meshed_manager_matches_single_device(tiny_cfg, tiny_params):
    """FleetManager(mesh=...) serves int8-KV streams through the
    shard_mapped Pallas kernel (TP heads + DP streams) and must reproduce
    the single-device manager's tokens."""
    import jax
    from voxtral_tpu.parallel.sharding import make_mesh
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    if tiny_cfg.decoder.kv_heads % 2 or tiny_cfg.encoder.heads % 2:
        pytest.skip("tiny config heads not 2-divisible")
    a0, a1 = _audio(3), _audio(4, seconds=2.0)

    ref = FleetManager(tiny_params, tiny_cfg, batch=2, chunk_tokens=8,
                       dec_ring=256, continuous=True, kv_dtype="int8")
    r0, r1 = ref.attach(), ref.attach()
    want = _serve(ref, {r0: a0, r1: a1})

    with FleetManager(tiny_params, tiny_cfg, batch=2, chunk_tokens=8,
                      dec_ring=256, continuous=True, kv_dtype="int8",
                      mesh=make_mesh(2, 2)) as mgr:
        s0, s1 = mgr.attach(), mgr.attach()
        got = _serve(mgr, {s0: a0, s1: a1})
    assert got[s0] == want[r0]
    assert got[s1] == want[r1]


def test_meshed_manager_q8_params(tiny_cfg, tiny_params):
    """Q8 (Quantized) param trees must shard under a TP mesh: the scale
    vector rides the same mesh axis as the axis it scales (shard_tree)."""
    import copy

    import jax
    from voxtral_tpu.parallel.sharding import make_mesh
    from voxtral_tpu.quant import quantize_params
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    if tiny_cfg.decoder.kv_heads % 2 or tiny_cfg.encoder.heads % 2:
        pytest.skip("tiny config heads not 2-divisible")
    audio = _audio(15, seconds=2.0)
    qp_ref = quantize_params(copy.deepcopy(tiny_params))
    ref = FleetManager(qp_ref, tiny_cfg, batch=1, chunk_tokens=8,
                       dec_ring=256, continuous=True, kv_dtype="int8")
    want = _serve(ref, {ref.attach(): audio})[0]

    qp = quantize_params(copy.deepcopy(tiny_params))
    with FleetManager(qp, tiny_cfg, batch=2, chunk_tokens=8, dec_ring=256,
                      continuous=True, kv_dtype="int8",
                      mesh=make_mesh(2, 2)) as mgr:
        sid = mgr.attach()
        got = _serve(mgr, {sid: audio})[sid]
    assert got == want


def _duty_cycle_serve(mgr, x_sid, sib_sids, x_audio, sib_audio, chunk_samp,
                      duty=4):
    """Feed siblings every round, X only every `duty` rounds; returns the
    number of rounds run."""
    rounds = len(sib_audio) // chunk_samp
    for i in range(rounds):
        for sid in sib_sids:
            mgr.feed(sid, sib_audio[i * chunk_samp:(i + 1) * chunk_samp])
        if i % duty == 0:
            j = i // duty
            mgr.feed(x_sid, x_audio[j * chunk_samp:(j + 1) * chunk_samp])
        mgr.poll()
    return rounds


def test_lockstep_lag_exact_within_ring_bound(tiny_cfg, tiny_params):
    """A 25%-duty-cycle stream in a busy fleet still matches its solo run
    as long as the ring holds >= duty x window positions: its in-window
    entries span window/chunk_tokens of ITS chunks = duty x that many
    cursor ticks, all younger than the ring size. This pins the documented
    lockstep-lag bound from the exact side (reference semantics: per-stream
    cache, voxtral_decoder.c:251-384)."""
    chunk_tokens = 8
    chunk_samp = chunk_tokens * 1280
    x_audio = _audio(21, seconds=10.0)[:12 * chunk_samp]
    sib_audio = _audio(22, seconds=40.0)[:48 * chunk_samp]

    solo = FleetManager(tiny_params, tiny_cfg, batch=1,
                        chunk_tokens=chunk_tokens, dec_ring=256,
                        continuous=False)
    xs = solo.attach()
    for j in range(12):
        solo.feed(xs, x_audio[j * chunk_samp:(j + 1) * chunk_samp])
        solo.poll()
    want = list(solo.slots[xs].all_ids)

    mgr = FleetManager(tiny_params, tiny_cfg, batch=3,
                       chunk_tokens=chunk_tokens, dec_ring=256,
                       continuous=False)
    x = mgr.attach()
    sibs = [mgr.attach(), mgr.attach()]
    _duty_cycle_serve(mgr, x, sibs, x_audio, sib_audio, chunk_samp)
    got = list(mgr.slots[x].all_ids)
    assert got == want, "laggard diverged inside the ring bound"

    window = min(tiny_cfg.decoder.window, 256)
    # full-rate sibling: retained == min(pos, window) exactly
    sib_pos = int(np.asarray(mgr.state.decode.pos)[sibs[0]])
    assert mgr.retained_kv(sibs[0]) == min(sib_pos, window)
    # the laggard kept its whole window too (the exactness precondition)
    x_pos = int(np.asarray(mgr.state.decode.pos)[x])
    assert mgr.retained_kv(x) >= min(x_pos, window)


def test_lockstep_lag_shrink_is_measurable(tiny_cfg, tiny_params):
    """With a ring SMALLER than duty x window, the laggard's oldest
    in-window slots get recycled by the shared cursor — retained_kv must
    report the shrink (the checkable counter for the documented caveat),
    while full-rate siblings keep their full window."""
    chunk_tokens = 8
    chunk_samp = chunk_tokens * 1280
    x_audio = _audio(23, seconds=10.0)[:12 * chunk_samp]
    sib_audio = _audio(24, seconds=40.0)[:48 * chunk_samp]

    mgr = FleetManager(tiny_params, tiny_cfg, batch=3,
                       chunk_tokens=chunk_tokens, dec_ring=64,
                       continuous=False)
    x = mgr.attach()
    sibs = [mgr.attach(), mgr.attach()]
    _duty_cycle_serve(mgr, x, sibs, x_audio, sib_audio, chunk_samp)

    dec = mgr.state.decode
    ring = dec.k_ring[0].shape[1] - dec.pending_sp.shape[1]
    window = min(tiny_cfg.decoder.window, ring)
    x_pos = int(np.asarray(dec.pos)[x])
    retained = mgr.retained_kv(x)
    assert x_pos > window, "test setup: laggard must outgrow its window"
    assert retained < window, (
        f"expected measurable shrink: retained {retained} vs window "
        f"{window} (ring {ring})")
    # the shrink is bounded by the ring: the laggard keeps at least the
    # positions written within the last `ring` cursor ticks
    assert retained >= ring // (4 * chunk_tokens) * chunk_tokens - chunk_tokens
    sib_pos = int(np.asarray(dec.pos)[sibs[0]])
    assert mgr.retained_kv(sibs[0]) == min(sib_pos, window)


def test_noncontinuous_eos_stops_stream(tiny_cfg, tiny_params):
    """A non-continuous slot that emits EOS must stop decoding — nothing
    is emitted OR generated after it, matching VoxStream / the batch
    pipeline / the reference (voxtral.c:1098-1184: outside continuous mode
    eos_seen ends decode permanently).

    A real on-device EOS is forced by re-designating a known mid-stream
    greedy token as the EOS id: greedy tokens are weight-deterministic, and
    streaming.eos only affects the stop logic, not the feedback path. The
    raw tiny weights lock greedy onto one token (the largest embed row
    dominates the feedback loop), so the embed rows are normalized and the
    adapter amplified to make tokens audio-dependent."""
    import dataclasses

    import jax.numpy as jnp

    from voxtral_tpu.models.pipeline import transcribe_tokens_batch

    emb = np.asarray(tiny_params["decoder"]["embed"], np.float32)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True) * 0.05
    adapter = {k: jnp.asarray(np.asarray(v, np.float32) * 4.0)
               for k, v in tiny_params["adapter"].items()}
    params = {**tiny_params, "adapter": adapter,
              "decoder": {**tiny_params["decoder"],
                          "embed": jnp.asarray(emb)}}

    audio = _audio(21, seconds=3.0)
    probe = [int(t)
             for t in transcribe_tokens_batch(params, tiny_cfg, audio)[0]]
    assert len(probe) >= 8
    # the text token (>= n_special, so replay/control paths are unaffected)
    # whose FIRST occurrence is latest -> the EOS fires mid-stream
    firsts = {}
    for i, t in enumerate(probe):
        if t >= tiny_cfg.streaming.n_special:
            firsts.setdefault(t, i)
    t_eos, first = max(firsts.items(), key=lambda kv: kv[1])
    assert 1 <= first < len(probe) - 1

    cfg2 = dataclasses.replace(
        tiny_cfg,
        streaming=dataclasses.replace(tiny_cfg.streaming, eos=t_eos))
    want = [int(t)
            for t in transcribe_tokens_batch(params, cfg2, audio)[0]]
    assert want == probe[:first]       # the oracle stopped at the EOS

    mgr = FleetManager(params, cfg2, batch=2, chunk_tokens=8,
                       dec_ring=256, continuous=False)
    s0, s1 = mgr.attach(), mgr.attach()
    got = _serve(mgr, {s0: audio, s1: _audio(22, seconds=3.0)})
    assert got[s0][-1] == t_eos, "stream must end AT the EOS"
    assert got[s0][:-1] == want
    assert mgr.slots[s0].eos_seen
    assert mgr.is_finished(s0)


def test_manager_monitor_hook(tiny_cfg, tiny_params):
    """FleetManager(monitor=...) surfaces the reference's per-event symbols
    per slot: decode-batch classification (▪▸▫▹✗✘◦ + ⚠/☠ severity) and
    restart trigger/tier pairs (↺⟳↯⌚ + ✂/♻)."""
    import voxtral_tpu.runtime.manager as M
    events = []
    old = M.MAX_DECODE_KV
    M.MAX_DECODE_KV = 24            # force a ⟳ restart within the clip
    try:
        mgr = FleetManager(tiny_params, tiny_cfg, batch=2, chunk_tokens=8,
                           dec_ring=256, continuous=True,
                           monitor=lambda sid, sym: events.append((sid, sym)))
        s0 = mgr.attach()
        _serve(mgr, {s0: _audio(31, seconds=4.0)})
    finally:
        M.MAX_DECODE_KV = old
    assert events
    assert all(sid == s0 for sid, _ in events)
    syms = [sym for _, sym in events]
    decode_syms = [x for x in syms if x[0] in "▪▸▫▹✗✘◦"]
    assert decode_syms, syms
    restart_syms = [x for x in syms if x[0] in "↺⟳↯⌚"]
    assert any(x.startswith("⟳") for x in restart_syms), syms
    assert all(len(x) == 2 and x[1] in "✂♻" for x in restart_syms), syms


def test_pack_wire_roundtrip(tiny_cfg):
    """pack_wire (host) -> _unpack_wire (device) is exact for both wire
    dtypes, including the -1 'no forced token' sentinel and forced ids with
    a set bit 16 (the s16 wire splits forced into lo/hi int16 halves)."""
    import jax.numpy as jnp

    from voxtral_tpu.runtime.fleet import _unpack_wire, pack_wire

    hop = tiny_cfg.audio.hop_length
    n = 6                                   # tokens per chunk
    b = 3
    rng = np.random.RandomState(7)
    pcm_f = ((rng.rand(b, n * 8 * hop) - 0.5) * 0.5).astype(np.float32)
    active = np.array([True, False, True])
    forced = np.full((b, n), -1, np.int32)
    forced[0, :3] = [0, 70000, 131071]      # bit 16 set + extremes
    forced[2, :] = rng.randint(0, 131072, n)

    w = pack_wire(pcm_f, active, forced)
    p2, a2, f2 = (np.asarray(x)
                  for x in _unpack_wire(tiny_cfg, jnp.asarray(w)))
    assert np.array_equal(p2, pcm_f)
    assert np.array_equal(a2, active)
    assert np.array_equal(f2, forced)

    pcm_s = np.clip(np.rint(pcm_f * 32768.0), -32768, 32767).astype(np.int16)
    w = pack_wire(pcm_s, active, forced)
    p2, a2, f2 = (np.asarray(x)
                  for x in _unpack_wire(tiny_cfg, jnp.asarray(w)))
    assert np.array_equal(p2, pcm_s)
    assert np.array_equal(a2, active)
    assert np.array_equal(f2, forced)


def test_max_steps_per_poll_caps_and_preserves_tokens(tiny_cfg, tiny_params):
    """Latency mode (max_steps_per_poll): each poll runs at most the cap
    and repeated polls drain the backlog to the SAME tokens as an
    uncapped manager — the cap only spreads the same steps over calls."""
    audio = _audio(5, seconds=3.0)

    def serve(cap):
        mgr = FleetManager(tiny_params, tiny_cfg, batch=1, chunk_tokens=6,
                           dec_ring=64, continuous=True,
                           max_steps_per_poll=cap)
        sid = mgr.attach()
        # feed everything up front: a big backlog the capped manager must
        # spread over many polls
        mgr.feed(sid, audio)
        polls = []
        for _ in range(200):
            st = mgr.poll()
            polls.append(st)
            if st == 0:
                break
        assert polls[-1] == 0, "backlog never drained"
        return mgr.slots[sid].all_ids, polls

    base, base_polls = serve(None)
    capped, polls = serve(1)
    assert capped == base and len(base) > 10
    assert max(polls) <= 1                     # the cap held
    assert sum(polls) == sum(base_polls) or sum(polls) >= len(base) // 6


def test_max_steps_per_poll_spreads_restart_recovery(tiny_cfg, tiny_params,
                                                     monkeypatch):
    """A watchdog full reset pushes the prompt replay + audio back into
    the slot buffer; with the cap, the recovery drains one step per poll
    instead of one multi-step burst (VERDICT r3 next #3)."""
    import voxtral_tpu.runtime.manager as M
    monkeypatch.setattr(M, "MAX_DECODE_KV", 45)
    audio = _audio(6, seconds=4.0)
    mgr = FleetManager(tiny_params, tiny_cfg, batch=1, chunk_tokens=6,
                       dec_ring=64, continuous=True, max_steps_per_poll=1)
    sid = mgr.attach()
    chunk = mgr.chunk_samp
    polls = []
    for i in range(0, len(audio), chunk):
        mgr.feed(sid, audio[i:i + chunk])
        while True:
            st = mgr.poll()
            polls.append(st)
            if st == 0:
                break
    assert mgr.slots[sid].restarts > 0         # recovery actually happened
    assert max(polls) <= 1                     # and never burst a poll


def test_manager_int4_encoder_rings(tiny_cfg, tiny_params):
    """enc_kv_dtype="int4" through the full serving path: packed encoder
    rings, int8 decoder rings; the stream runs attach->feed->finish and
    emits a full token stream (int4 quantization may flip near-tie
    argmaxes vs int8, so this pins the machinery, not exact tokens —
    tools/parity_4b.py mode serving_int4 pins quality at 4B dims)."""
    audio = _audio(5, seconds=3.0)
    mgr = FleetManager(tiny_params, tiny_cfg, batch=2, chunk_tokens=8,
                       dec_ring=64, kv_dtype="int8", enc_kv_dtype="int4",
                       continuous=False)
    enc = mgr.state.encoder
    assert enc.k_ring[0].shape[-1] == tiny_cfg.encoder.attn_dim // 2
    assert enc.k_ring[0].dtype.name == "int8"      # packed bytes
    sid = mgr.attach()
    toks = _serve(mgr, {sid: audio})
    assert len(toks[sid]) > 10


def test_detached_slot_reuse_matches_solo(tiny_cfg, tiny_params):
    """Slot lifecycle under churn: a slot freed by finish() + detach() and
    re-attached serves its NEW stream bit-identically to a solo run — no
    state bleed (rings, cursors, watchdog clocks, token queues) survives
    slot reuse, even while a neighbor stream stays live across the swap.
    tools/soak_serving.py churns exactly this lifecycle at 4B scale."""
    a0 = _audio(11, seconds=2.0)
    a1 = _audio(12, seconds=3.0)
    a2 = _audio(13, seconds=2.0)
    solo2 = _solo_tokens(tiny_params, tiny_cfg, a2)

    mgr = FleetManager(tiny_params, tiny_cfg, batch=2, chunk_tokens=8,
                       dec_ring=256, continuous=True)
    s0, s1 = mgr.attach(), mgr.attach()
    # run s0 to completion while s1 is mid-flight
    for i in range(0, len(a0), 16000):
        mgr.feed(s0, a0[i:i + 16000])
        mgr.feed(s1, a1[i:i + 16000])
        mgr.poll()
    fed1 = (len(a0) // 16000) * 16000
    mgr.finish(s0)
    for _ in range(64):
        if mgr.is_finished(s0):
            break
        mgr.poll()
    assert mgr.is_finished(s0)
    mgr.detach(s0)
    s2 = mgr.attach()
    assert s2 == s0                        # the freed slot is reused
    assert mgr.slots[s2].all_ids == []     # fresh slot state
    got = _serve(mgr, {s2: a2, s1: a1[fed1:]})
    assert got[s2] == solo2


def test_abrupt_detach_slot_reuse_matches_solo(tiny_cfg, tiny_params):
    """Caller-abandoned stream: detach() WITHOUT finish(), mid-stream, with
    audio still buffered. attach() must hand out the slot with no bleed
    from the abandoned stream's rings/cursors/buffers (attach queues a
    full device-row reset; the stale host buffer dies with the old _Slot)."""
    a0 = _audio(21, seconds=3.0)
    a2 = _audio(22, seconds=2.0)
    solo2 = _solo_tokens(tiny_params, tiny_cfg, a2)

    mgr = FleetManager(tiny_params, tiny_cfg, batch=1, chunk_tokens=8,
                       dec_ring=256, continuous=True)
    s0 = mgr.attach()
    mgr.feed(s0, a0[:32000])
    mgr.poll()
    mgr.feed(s0, a0[32000:])       # leave un-consumed audio behind
    mgr.detach(s0)                 # abandon: no finish(), no drain
    s2 = mgr.attach()
    assert s2 == s0
    got = _serve(mgr, {s2: a2})
    assert got[s2] == solo2


def test_meshed_manager_slot_churn_matches_solo(tiny_cfg, tiny_params):
    """Slot churn (finish -> detach -> attach reuse) under a data x model
    mesh: the deferred-reset agreement path must hand the reused slot out
    clean while the sibling stream keeps running sharded — the multi-chip
    deployment's serving lifecycle (tools/soak_serving.py at fleet scale,
    here pinned bit-exact at tiny config on the virtual mesh)."""
    import jax
    from voxtral_tpu.parallel.sharding import make_mesh
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    if tiny_cfg.decoder.kv_heads % 2 or tiny_cfg.encoder.heads % 2:
        pytest.skip("tiny config heads not 2-divisible")
    a0 = _audio(31, seconds=2.0)
    a1 = _audio(32, seconds=3.0)
    a2 = _audio(33, seconds=2.0)
    solo2 = _solo_tokens(tiny_params, tiny_cfg, a2)

    with FleetManager(tiny_params, tiny_cfg, batch=2, chunk_tokens=8,
                      dec_ring=256, continuous=True, kv_dtype="int8",
                      mesh=make_mesh(2, 2)) as mgr:
        s0, s1 = mgr.attach(), mgr.attach()
        for i in range(0, len(a0), 16000):
            mgr.feed(s0, a0[i:i + 16000])
            mgr.feed(s1, a1[i:i + 16000])
            mgr.poll()
        fed1 = (len(a0) // 16000) * 16000
        mgr.finish(s0)
        for _ in range(64):
            if mgr.is_finished(s0):
                break
            mgr.poll()
        assert mgr.is_finished(s0)
        mgr.detach(s0)
        s2 = mgr.attach()
        assert s2 == s0
        got = _serve(mgr, {s2: a2, s1: a1[fed1:]})
    assert got[s2] == solo2


def test_pipelined_poll_matches_default(tiny_cfg, tiny_params):
    """pipeline_steps=2 (dispatch step k+1 before fetching step k's
    tokens — hides the per-step host sync) must produce token streams
    identical to the default serial poll, with and without alt-tokens."""
    a0, a1 = _audio(41, seconds=4.0), _audio(42, seconds=3.0)

    def run(pipeline, n_alt=1):
        mgr = FleetManager(tiny_params, tiny_cfg, batch=2, chunk_tokens=8,
                           dec_ring=256, continuous=True, n_alt=n_alt,
                           alt_cutoff=0.9 if n_alt > 1 else 0.0,
                           pipeline_steps=pipeline)
        s0, s1 = mgr.attach(), mgr.attach()
        got = _serve(mgr, {s0: a0, s1: a1})
        return got[s0], got[s1]

    assert run(2) == run(1)
    assert run(2, n_alt=2) == run(1, n_alt=2)


def test_pipelined_poll_restart_discard_matches(tiny_cfg, tiny_params,
                                               monkeypatch):
    """Watchdog restarts under the pipeline: the restarting stream's
    already-dispatched next step is DISCARDED (tokens dropped, samples
    pushed back, state erased by the queued reset) — final token streams
    must still match the serial order exactly, for the restarted stream
    AND its unaffected sibling."""
    import voxtral_tpu.runtime.manager as M
    monkeypatch.setattr(M, "MAX_DECODE_KV", 40)    # force kv restarts
    a0, a1 = _audio(43, seconds=5.0), _audio(44, seconds=5.0)

    def run(pipeline):
        mgr = FleetManager(tiny_params, tiny_cfg, batch=2, chunk_tokens=8,
                           dec_ring=256, continuous=True,
                           pipeline_steps=pipeline)
        s0, s1 = mgr.attach(), mgr.attach()
        got = _serve(mgr, {s0: a0, s1: a1})
        return got, sum(mgr.slots[s].restarts for s in (s0, s1))

    base, rb = run(1)
    piped, rp = run(2)
    assert rb > 0 and rp > 0                       # restarts really fired
    assert piped == base


def test_restart_keeps_empty_staged_multiproc(tiny_cfg, tiny_params,
                                              monkeypatch):
    """Multi-process guard (latent bug fixed round 5): a watchdog restart
    that empties this host's staged batch must NOT null it when other
    processes exist — the step is globally agreed, and nulling on one
    host only would desync the collective call sequence. The fleet must
    keep serving (possibly via an all-inactive local step) and the
    stream must recover."""
    import voxtral_tpu.runtime.manager as M
    # NOTE: must exceed the prompt replay length (prompt_len - 1), else the
    # kv watchdog fires mid-replay forever (true of the serial path too)
    monkeypatch.setattr(M, "MAX_DECODE_KV", 45)
    mgr = FleetManager(tiny_params, tiny_cfg, batch=1, chunk_tokens=8,
                       dec_ring=256, continuous=True)
    sid = mgr.attach()
    # pretend to be one of two processes; collectives reduce to identity
    mgr._n_procs = 2
    mgr._any_hosts = lambda flags: np.asarray(flags, bool)
    audio = _audio(45, seconds=4.0)
    chunk = mgr.chunk_samp
    # feed 2 chunks per poll so restarts land while the next chunk is
    # staged (the un-staging path whose nulling this test guards)
    for i in range(0, len(audio), 2 * chunk):
        mgr.feed(sid, audio[i:i + 2 * chunk])
        mgr.poll()
    assert mgr.slots[sid].restarts > 0
    assert mgr.slots[sid].generated > 0            # recovered and decoding


def test_pipelined_noncontinuous_finish_matches_batch(tiny_cfg, tiny_params):
    """Non-continuous + pipeline_steps=2: device-side EOS freezing, the
    finish() right-pad schedule, and the in-flight finish check (which now
    spans dispatched steps, not just the pending staged batch) must still
    reproduce the batch pipeline's tokens exactly."""
    from voxtral_tpu.models.pipeline import transcribe_tokens_batch
    audio = _audio(9, seconds=2.7)    # deliberately not chunk-aligned
    want = [int(t) for t in
            transcribe_tokens_batch(tiny_params, tiny_cfg, audio)[0]]

    mgr = FleetManager(tiny_params, tiny_cfg, batch=2, chunk_tokens=8,
                       dec_ring=256, continuous=False, pipeline_steps=2)
    sid = mgr.attach()
    mgr.feed(sid, audio)
    mgr.finish(sid)
    for _ in range(64):
        if mgr.is_finished(sid):
            break
        mgr.poll()
    assert mgr.is_finished(sid)
    assert list(mgr.slots[sid].all_ids) == want
