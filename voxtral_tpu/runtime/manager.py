"""FleetManager: multi-stream production serving runtime.

Hosts B concurrent transcription streams in ONE device-resident FleetState,
advanced by a single compiled program (fleet_step_masked): device-side mel,
batched conv/encoder/adapter, lockstep greedy decode. This is the DP
serving layer the reference lacks (it is single-stream-per-process,
voxtral.c:1242; SURVEY.md §2.4) — concurrent streams share every weight
read, which is where the >=50x-per-chip headline comes from.

Per-stream lifecycle on shared batched state:
- attach(): claims a slot, masked full reset (fleet_reset_slots), then the
  39-token prompt enters via FORCED-TOKEN REPLAY — decode positions i <
  prompt_len-1 take frame[i] + embed(pad) with the greedy choice overridden,
  which computes exactly what decoder_prefill computes, but per-slot inside
  a live fleet (one program for every stream state).
- feed()/finish(): host-side sample buffering; a stream joins a step only
  with a FULL chunk (full-or-nothing masking keeps each stream's
  tails/cursors exact; see fleet_step_masked).
- watchdogs: the reference's stream self-healing (voxtral.c:410-420,
  1189-1239) per slot — restart on EOS, on decode KV > 2000, on >=64
  consecutive non-text tokens, on 20 s without text; decoder-only restart
  escalating to full reset after repeated textless restarts.

Caveat (documented in models/decoder.py): the lockstep ring cursor advances
with the busiest stream, so a slot that idles while siblings run has its
oldest ring entries recycled early — bounded in practice by the 2000-token
restart cap, and irrelevant for equal-rate streams.

Multi-host DP (BASELINE.json "streams DP across 2 hosts"): pass a mesh that
spans processes (parallel/distributed.global_mesh). Every process runs this
manager over the SAME global FleetState; each manages only its host-local
rows of the stream batch (attach/feed/get are per-process, slot ids are
local), uploads only those rows (make_array_from_process_local_data) and
reads back only those rows of the token output. Control decisions that
gate compiled calls (any stream ready? any watchdog reset?) are agreed via
tiny boolean all-gathers so all processes execute identical call
sequences; per-slot resets are therefore DEFERRED to the next step
boundary (semantically identical: no step runs in between). All processes
must drive poll() in lockstep.
"""

from __future__ import annotations

import dataclasses
import time

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.parallel.sharding import DATA
from voxtral_tpu.models.decoder import ada_scales, time_conditioning
from voxtral_tpu.runtime.alts import select_alts
from voxtral_tpu.runtime.fleet import (
    fleet_reset_slots, fleet_step_masked, init_fleet_state, pack_wire,
    pcm_stream_skew,
)

MAX_DECODE_KV = 2000              # voxtral.c:412
MAX_NON_TEXT_STREAK = 64
MAX_NO_TEXT_SECONDS = 20.0
EMPTY_RESTARTS_FOR_FULL_RESET = 2


@dataclasses.dataclass
class _Staged:
    """A cut-and-uploaded chunk batch awaiting dispatch (see poll()).

    Staging happens while the PREVIOUS step still runs on the device: the
    PCM upload (the dominant host cost — ~20 MB/step at B=32) overlaps
    device compute instead of serializing with it. `raw` keeps the host
    copy of each slot's samples so a watchdog restart discovered when the
    previous step's tokens land can push the chunk back into the slot's
    buffer (the staged row is then masked off and re-cut after the
    restart, exactly like the unpipelined order of events)."""
    pcm_dev: object                        # device packed wire rows
    active: "np.ndarray"                   # [B] bool (host; mutable)
    forced: "np.ndarray"                   # [B, n] int32 (host copy)
    part: list                             # participating sids
    raw: dict                              # sid -> host samples row
    pcm_host: "np.ndarray" = None          # [B, chunk] wire-dtype rows
    dirty: bool = False                    # active/forced edited after the
    # wire upload (watchdog un-staging) -> re-pack + re-upload at dispatch
    out: object = None                     # device output handle (tokens or
    # packed aux) once dispatched, fetched at retire (pipeline_steps > 1
    # keeps it unfetched while the NEXT step runs)
    t_dispatch: float = 0.0
    discard: set = dataclasses.field(default_factory=set)  # sids whose rows
    # were already on the device when a watchdog restart hit: their tokens
    # are dropped at retire and their samples pushed back (the queued reset
    # erases the step's state writes for those rows)


@dataclasses.dataclass
class _Slot:
    active: bool = False
    buf: np.ndarray = None                 # pending samples
    replay_left: int = 0                   # forced prompt tokens remaining
    queue: list = None                     # [(token_id, piece)]
    finishing: bool = False
    finished: bool = False
    eos_seen: bool = False                 # non-continuous: slot is stopped
    # watchdog counters
    pos: int = 0                           # decode KV length since restart
    nontext_streak: int = 0
    samples_since_text: int = 0
    text_since_restart: bool = False
    empty_restarts: int = 0
    # finish(): number of real (non-chunk-fill) tokens this stream will have
    # emitted in total — output beyond it comes from the final chunk's fill
    # padding and is dropped (exact parity with the batch pipeline's
    # right-pad schedule)
    token_limit: int = None
    # incremental UTF-8 piece decoder (tokenizer.StreamDecoder) — None
    # when the manager has no tokenizer
    sdec: object = None
    # stats
    generated: int = 0
    text_tokens: int = 0
    restarts: int = 0
    samples_done: int = 0                  # samples the device consumed
    # (incl. left-pad silence, matching the bucketed mel_cursor semantics)
    # full greedy stream (text + control + eos, replay excluded) — the
    # queue carries only TEXT tokens (reference semantics); tests compare
    # this to a solo run so control-only output is still checked
    all_ids: list = None


class FleetManager:
    def __init__(self, params, cfg: VoxtralConfig, batch: int, *,
                 tokenizer=None, chunk_tokens: int = 20,
                 max_chunk_tokens: int | None = None,
                 delay_tokens: int | None = None, kv_dtype: str = "float",
                 enc_kv_dtype: str | None = None,
                 enc_ring: int | None = None, dec_ring: int = 2048,
                 continuous: bool = True, n_alt: int = 1,
                 alt_cutoff: float = 0.0, mesh=None,
                 wire_dtype: str = "f32", monitor=None,
                 monitor_slow_ms: float = 40.0,
                 max_steps_per_poll: int | None = None,
                 pipeline_steps: int = 1):
        # monitor: optional per-slot pipeline-event hook `monitor(sid, sym)`
        # with the reference's --monitor symbol set (README.md:105-130):
        # ▪/▸ text decode fast/slow, ▫/▹ control-only, ✗/✘ invalid, ◦ EOS,
        # ⚠/☠ streak severity, ↺⟳↯⌚ restart triggers + ✂/♻ reset tier.
        # slow = step wall-time per token > monitor_slow_ms.
        # wire_dtype="s16": ship PCM to the device as int16 (the native WAV/
        # mic sample format — halves host->device traffic) and convert on
        # device (exact: int16 -> f32 and the *2^-15 scale are lossless).
        # Float feeds are round-tripped through int16 in this mode.
        # mesh: optional ('data','model') jax Mesh for multi-chip serving —
        # params are TP-sharded, stream state DP/head-sharded, and the
        # manager holds parallel.sharding.use_tp_mesh OPEN for its lifetime
        # so the fused attention kernel traces under shard_map (call
        # close() to release). batch must divide by the data axis. A mesh
        # spanning processes makes this a multi-host DP manager (see module
        # docstring): `batch` stays the GLOBAL stream count.
        self.mesh = mesh
        self._mesh_cm = None
        self._n_procs = 1
        self.row_lo, self.row_hi = 0, batch
        if mesh is not None:
            from voxtral_tpu.parallel.distributed import host_row_range
            from voxtral_tpu.parallel.sharding import (
                shard_params, use_tp_mesh)
            import jax
            self._mesh_cm = use_tp_mesh(mesh)
            self._mesh_cm.__enter__()
            params = shard_params(params, cfg, mesh)
            self._n_procs = jax.process_count()
            if self._n_procs > 1:
                self.row_lo, self.row_hi = host_row_range(mesh, batch)
        self.local_batch = self.row_hi - self.row_lo
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        # alt-tokens (vox_stream_set_alt, voxtral.c:1329-1353): up to n_alt-1
        # alternatives within probability cutoff of the best token
        self.n_alt = max(1, min(4, n_alt))
        self.alt_cutoff = alt_cutoff
        self.batch = batch
        self.n = chunk_tokens                       # decode tokens per step
        self.chunk_mel = chunk_tokens * 8
        self.chunk_samp = self.chunk_mel * cfg.audio.hop_length
        # max_chunk_tokens sizes the device pending blocks so
        # set_chunk_tokens can later raise the step size without touching
        # device state (VoxStream's set_interval rides this)
        self.max_chunk_tokens = max(chunk_tokens, max_chunk_tokens or 0)
        self.continuous = continuous
        st = cfg.streaming
        self.delay = st.delay_tokens if delay_tokens is None else delay_tokens
        self.prompt_len = 1 + st.n_left_pad_tokens + self.delay
        self.t_ada = ada_scales(
            params["decoder"],
            time_conditioning(self.delay, cfg.decoder.dim))
        enc_ring = enc_ring or (cfg.encoder.window
                                + self.max_chunk_tokens * 4 + 8)
        # enc_kv_dtype="int4": nibble-packed encoder rings — the round-4
        # headline serving config (see models/encoder.py; bench.py uses
        # Q8 weights + int8 decoder KV + int4 encoder rings at B=40)
        self.state = init_fleet_state(
            cfg, batch=batch, enc_ring=enc_ring, dec_ring=dec_ring,
            max_mel_chunk=self.max_chunk_tokens * 8, kv_dtype=kv_dtype,
            enc_kv_dtype=enc_kv_dtype)
        if mesh is not None:
            from voxtral_tpu.parallel.sharding import (
                fleet_state_pspecs, shard_tree)
            self.state = shard_tree(
                self.state,
                fleet_state_pspecs(cfg, kv_dtype, enc_kv_dtype), mesh)
        # slot ids are LOCAL rows (== global rows single-process)
        self.slots = [_Slot() for _ in range(self.local_batch)]
        self._pending_resets: dict = {}    # local sid -> full: bool
        self.left_pad = (st.n_left_pad_tokens * cfg.audio.raw_audio_per_token
                         - pcm_stream_skew(cfg))
        self.steps = 0
        assert wire_dtype in ("f32", "s16"), wire_dtype
        self.wire_dtype = wire_dtype
        self._staged_next = None       # staged, not yet dispatched (<= 1)
        self._dispatched = []          # dispatched _Staged awaiting retire
        self._inflight_sids = set()    # raw-sample owners still in flight
        # pipeline_steps=2: dispatch step k+1 BEFORE fetching step k's
        # tokens, hiding the ~26 ms/step host sync this tunnel charges for
        # every dispatch-fetch round trip (SPEED.md round-5 serving soak).
        # Token streams are identical: a watchdog restart discovered in
        # step k's tokens DISCARDS the restarting stream's already-running
        # step-k+1 row (samples pushed back, replayed after the queued
        # reset — same recovery the un-staging path performs one step
        # earlier); all other rows are unaffected. Trade-off: up to one
        # extra step of recovery delay and per-poll latency — use for
        # throughput serving, keep 1 (the default) for latency mode.
        self.pipeline_steps = max(1, pipeline_steps)
        self._monitor = monitor
        self.monitor_slow_ms = monitor_slow_ms
        self._last_step_ms = 0.0
        # cumulative wall time inside device steps (dispatch -> tokens
        # fetched, incl. the overlapped next-chunk staging): poll() wall
        # minus this is the host-side share (stage-entry upload, resets,
        # consume) — the serving-pipeline attribution tools/soak_serving.py
        # and profilers read via stats()["step_ms_total"]
        self.step_ms_total = 0.0
        # Latency mode: bound each poll() to this many device steps; the
        # remaining backlog (e.g. a watchdog full-reset's prompt-replay +
        # pushed-back audio, ~6-7 chunks) drains across SUBSEQUENT polls
        # instead of one multi-step burst. The reference replays in one
        # burst because its API has no re-poll (voxtral.c:778-824); here
        # a real-time caller polls again in the idle time between feeds,
        # so per-poll wall time — the token-delivery jitter — stays
        # bounded at ~one step. Semantically identical: the same steps
        # run in the same order, just spread over calls. Multi-host: the
        # cap is config, identical on every process, so the agreed
        # call sequence stays in lockstep.
        self.max_steps_per_poll = max_steps_per_poll

    # -- lifecycle ----------------------------------------------------------

    def attach(self) -> int:
        """Claim a free slot; returns the stream id (host-local row). The
        stream's padded sample stream starts with the left-pad silence
        (minus the device skew, see fleet.py:pcm_stream_skew). The slot's
        device rows reset at the next step boundary (_apply_resets)."""
        for sid, s in enumerate(self.slots):
            if not s.active:
                break
        else:
            raise RuntimeError("fleet full")
        self.slots[sid] = _Slot(
            active=True, buf=np.zeros(self.left_pad, np.float32), queue=[],
            replay_left=self.prompt_len - 1, all_ids=[],
            sdec=self.tok.stream_decoder() if self.tok else None)
        self._queue_reset(sid, full=True)
        return sid

    def detach(self, sid: int):
        self.slots[sid].active = False

    def set_chunk_tokens(self, chunk_tokens: int):
        """Change the step size (tokens per compiled step). Device state is
        untouched — the pending blocks were sized by max_chunk_tokens at
        init, so any chunk up to that bound folds exactly; a new size only
        compiles a new step program (cached per shape). Must be called
        between polls (no staged chunk in flight)."""
        assert self._staged_next is None and not self._dispatched, \
            "chunk change with a step in flight"
        if chunk_tokens > self.max_chunk_tokens:
            raise ValueError(
                f"chunk_tokens {chunk_tokens} exceeds max_chunk_tokens "
                f"{self.max_chunk_tokens} the device state was sized for")
        self.n = chunk_tokens
        self.chunk_mel = chunk_tokens * 8
        self.chunk_samp = self.chunk_mel * self.cfg.audio.hop_length

    def set_delay(self, delay_tokens: int):
        """Change the transcription delay (vox_set_delay semantics,
        voxtral.c:1681-87): the per-layer ada conditioning switches
        immediately; the prompt length applies to FUTURE prompt builds
        (attach / watchdog full resets) — already-prefilled slots keep
        their current prompt, like the reference. A slot whose prompt
        replay was latched at attach but has not consumed ANY of it yet
        (no step run) re-latches to the new length: its prompt is still
        a future build."""
        old_lp = self.prompt_len
        self.delay = delay_tokens
        st = self.cfg.streaming
        self.prompt_len = 1 + st.n_left_pad_tokens + self.delay
        self.t_ada = ada_scales(
            self.params["decoder"],
            time_conditioning(self.delay, self.cfg.decoder.dim))
        for s in self.slots:
            if s.active and s.pos == 0 and s.replay_left == old_lp - 1:
                s.replay_left = self.prompt_len - 1

    def feed(self, sid: int, samples: np.ndarray):
        s = self.slots[sid]
        assert s.active and not s.finishing
        samples = np.asarray(samples, np.float32).reshape(-1)
        s.buf = np.concatenate([s.buf, samples])
        s.samples_since_text += samples.size

    def finish(self, sid: int):
        """Append right padding + pad the final partial chunk; the slot
        drains on subsequent polls and then reports finished."""
        s = self.slots[sid]
        if s.finishing:
            return
        mult = self.cfg.audio.raw_audio_per_token
        # right pad follows the manager's delay override, not the config
        # default (voxtral.c:1645-1648 computes it from the live delay)
        n_right = self.delay + 1 + self.cfg.streaming.extra_right_pad_tokens
        total = len(s.buf)
        align = (mult - (total % mult)) % mult
        pad = align + n_right * mult
        # tokens beyond the exact right-pad schedule come from rounding the
        # final chunk up to the step size — cap the emitted stream so a
        # finished slot's output matches the batch pipeline token-for-token
        real_remaining = (total + pad) // mult
        # finish() runs outside poll(), so nothing is in flight: `generated`
        # is exact, and replay_left frames of the remainder emit no tokens
        s.token_limit = s.generated + real_remaining - max(s.replay_left, 0)
        rem = (total + pad) % self.chunk_samp
        if rem:
            pad += self.chunk_samp - rem
        s.buf = np.concatenate([s.buf, np.zeros(pad, np.float32)])
        s.finishing = True

    def get(self, sid: int):
        """Drain (token_id, piece) pairs (text tokens only)."""
        s = self.slots[sid]
        out, s.queue = s.queue, []
        return out

    def is_finished(self, sid: int) -> bool:
        return self.slots[sid].finished

    # -- stepping -----------------------------------------------------------

    def ready(self) -> bool:
        return any(s.active and len(s.buf) >= self.chunk_samp
                   for s in self.slots)

    def poll(self):
        """Run lockstep steps while any stream has a full chunk buffered.

        Double-buffered: while step k runs on the device, step k+1's chunks
        are cut and UPLOADED (the host->device PCM transfer overlaps device
        compute — on slow links the upload otherwise costs as much as the
        step itself; see SPEED.md). Step k+1's forced-replay rows are
        projected past step k's in-flight replay, so results are identical
        to the serial order; a restart discovered in step k's tokens pushes
        the staged slot's samples back and masks its row off.

        Multi-host: every process must call poll() at the same time; the
        number of steps taken is agreed via _any_hosts, so all processes
        run the same compiled-call sequence even when only one of them has
        ready streams.

        Returns the number of device steps taken. With max_steps_per_poll
        set (latency mode), at most that many steps run per call and the
        rest of the backlog waits for the next poll — call again until 0
        to drain."""
        cap = self.max_steps_per_poll
        cap = max(1, cap) if cap is not None else None
        depth = self.pipeline_steps
        topk = self.n_alt - 1 if self.n_alt > 1 else 0
        steps_done = dispatched = 0
        t_last_retire = time.perf_counter()
        self._staged_next = self._stage_sync({})
        while self._staged_next is not None or self._dispatched:
            # dispatch while the pipeline has room and the cap allows;
            # Non-continuous streams stop decoding at EOS ON DEVICE (the
            # per-slot `done` flag freezes the slot until reset), matching
            # VoxStream/batch/the reference (voxtral.c:1098-1184: EOS ends
            # decode outside continuous mode). Continuous mode instead
            # restarts via the host watchdog at the chunk boundary.
            while (self._staged_next is not None
                   and len(self._dispatched) < depth
                   and (cap is None or dispatched < cap)):
                self._apply_resets()       # queued attach/watchdog resets
                st = self._staged_next
                self._staged_next = None
                if st.dirty:
                    # a watchdog restart edited the staged rows after their
                    # wire upload — re-pack and re-upload (rare path)
                    st.pcm_dev = self._put(
                        pack_wire(st.pcm_host, st.active, st.forced),
                        P(DATA, None))
                    st.dirty = False
                st.t_dispatch = time.perf_counter()
                self.state, tokens, aux = fleet_step_masked(
                    self.params, self.cfg, self.state, st.pcm_dev,
                    None, None, self.t_ada, collect_topk=topk,
                    stop_at_eos=not self.continuous, wire_packed=True)
                st.out = aux["packed"] if topk else tokens
                self._dispatched.append(st)
                dispatched += 1
                if cap is None or dispatched < cap:
                    # stage the next chunk batch NOW: its upload overlaps
                    # the running step; forced rows project past every
                    # in-flight replay so results match the serial order
                    self._staged_next = self._stage_sync(
                        self._inflight_replay())
            # retire the oldest in-flight step
            staged = self._dispatched.pop(0)
            self._inflight_sids = set()
            for g in self._dispatched:
                self._inflight_sids |= set(g.raw)
            if self._staged_next is not None:
                self._inflight_sids |= set(self._staged_next.raw)
            alts = None
            if topk:
                # ONE download: tokens + best + top-k vals/idx ride a
                # single packed f32 array (int32 cols as bit patterns)
                pk = self._fetch(staged.out)
                tokens = np.ascontiguousarray(pk[:, :, 0]).view(np.int32)
                k = self.n_alt - 1
                alts = (pk[:, :, 2:2 + k],
                        np.ascontiguousarray(pk[:, :, 2 + k:2 + 2 * k])
                        .view(np.int32),
                        pk[:, :, 1])
            else:
                tokens = self._fetch(staged.out)       # wait for the step
            now = time.perf_counter()
            self._last_step_ms = (now - staged.t_dispatch) * 1e3
            # step_ms_total counts NON-overlapping wall time (pipelined
            # steps' windows overlap: clip each to start at the previous
            # retire) so poll wall minus it is the true host-side residual
            self.step_ms_total += (now - max(staged.t_dispatch,
                                             t_last_retire)) * 1e3
            t_last_retire = now
            self.steps += 1
            steps_done += 1
            for sid in staged.part:
                if sid in staged.discard:
                    continue       # restarted after this row was on device:
                    # samples were pushed back, tokens are void
                self.slots[sid].samples_done += staged.pcm_host.shape[1]
                self._consume(sid, tokens[sid], staged.forced[sid],
                              None if alts is None else
                              (alts[0][sid], alts[1][sid], alts[2][sid]))
            if (self._staged_next is None
                    and (cap is None or dispatched < cap)):
                # a restart may have re-buffered samples during consume
                self._staged_next = self._stage_sync(self._inflight_replay())
        self._apply_resets()   # resets from the final consume (keeps every
        # process's queue drained at the same agreed point)
        return steps_done

    def _inflight_replay(self) -> dict:
        """sid -> forced-replay tokens already claimed by dispatched,
        not-yet-retired steps (discarded rows excluded): staging projects
        the next chunk's forced rows past these so results are identical
        to the serial order."""
        out = {}
        for st in self._dispatched:
            for sid in st.part:
                if sid in st.discard:
                    continue
                n = int((st.forced[sid] >= 0).sum())
                if n:
                    out[sid] = out.get(sid, 0) + n
        return out

    def _any_hosts(self, flags) -> np.ndarray:
        if self._n_procs == 1:
            return np.asarray(flags, bool)
        from voxtral_tpu.parallel.distributed import any_across_hosts
        return any_across_hosts(np.asarray(flags, bool))

    def _put(self, local_rows: np.ndarray, spec):
        """Host-local rows -> device (global array under a mesh)."""
        if self.mesh is None:
            return jnp.asarray(local_rows)
        from voxtral_tpu.parallel.distributed import put_local_rows
        return put_local_rows(self.mesh, spec, local_rows, self.batch)

    def _fetch(self, garr) -> np.ndarray:
        """This host's rows of a step output, as numpy (waits for it)."""
        if self.mesh is None:
            return np.asarray(garr)
        from voxtral_tpu.parallel.distributed import fetch_local_rows
        return fetch_local_rows(garr, self.row_lo, self.row_hi)

    def _stage_sync(self, inflight: dict):
        """_stage, gated by the ACROSS-HOSTS ready flag: returns None iff
        no process has a full chunk buffered; a process with nothing ready
        still stages an all-inactive row block so it participates in the
        globally-agreed step."""
        if not self._any_hosts([self.ready()])[0]:
            return None
        return self._stage(inflight)

    def _stage(self, inflight: dict):
        """Cut a full chunk from every ready LOCAL slot and start its
        upload. inflight: sid -> number of forced-replay tokens in the step
        that is currently executing (not yet consumed) — replay projection
        keeps the staged forced rows identical to what the serial order
        would compute."""
        b, n = self.local_batch, self.n
        wire = np.int16 if self.wire_dtype == "s16" else np.float32
        pcm = np.zeros((b, self.chunk_samp), wire)
        active = np.zeros(b, bool)
        forced = np.full((b, n), -1, np.int32)
        part, raw = [], {}
        for sid, s in enumerate(self.slots):
            if not s.active or len(s.buf) < self.chunk_samp:
                continue
            row = s.buf[:self.chunk_samp]
            s.buf = s.buf[self.chunk_samp:]
            raw[sid] = row
            if wire is np.int16:
                pcm[sid] = np.clip(np.rint(row * 32768.0), -32768, 32767)
            else:
                pcm[sid] = row
            active[sid] = True
            part.append(sid)
            rl = s.replay_left - inflight.get(sid, 0)
            if rl > 0:
                forced[sid, :min(rl, n)] = self.cfg.streaming.streaming_pad
        # ONE upload per step: pcm + active + forced packed into a single
        # row block (pack_wire) — each extra transfer costs ~25 ms of
        # fixed link latency (SPEED.md serving-latency breakdown)
        wire = pack_wire(pcm, active, forced)
        return _Staged(pcm_dev=self._put(wire, P(DATA, None)), active=active,
                       forced=forced, part=part, raw=raw, pcm_host=pcm)

    def _queue_reset(self, sid: int, *, full: bool):
        """Defer a per-slot device reset to the next step boundary (full
        wins over decoder-only). Semantically identical to an immediate
        reset — no step runs in between — and it makes the compiled-call
        sequence host-count-invariant (see module docstring)."""
        self._pending_resets[sid] = full or self._pending_resets.get(
            sid, False)

    def _apply_resets(self):
        """Apply queued per-slot resets; all processes agree (tiny
        all-gather) on which of the two fleet_reset_slots calls happen."""
        if not self._pending_resets and self._n_procs == 1:
            return
        dec = np.zeros(self.local_batch, bool)
        full = np.zeros(self.local_batch, bool)
        for sid, f in self._pending_resets.items():
            (full if f else dec)[sid] = True
        self._pending_resets.clear()
        flags = self._any_hosts([dec.any(), full.any()])
        if flags[1]:
            self.state = fleet_reset_slots(self.cfg, self.state,
                                           self._put(full, P(DATA)),
                                           full=True)
        if flags[0]:
            self.state = fleet_reset_slots(self.cfg, self.state,
                                           self._put(dec, P(DATA)),
                                           full=False)

    def _mon_decode(self, sid: int, s: _Slot, steps: int, text: int,
                    control: int, invalid: int, eos_step: bool):
        """Per-slot decode-batch monitor symbol; same classification as
        VoxStream._mon_decode / voxtral.c:1151-1181."""
        slow = self._last_step_ms / max(self.n, 1) > self.monitor_slow_ms
        if text > 0:
            sym = "▸" if slow else "▪"
        elif invalid > 0:
            sym = "✘" if slow else "✗"
        elif control > 0:
            sym = "▹" if slow else "▫"
        elif eos_step:
            sym = "◦"
        else:
            sym = "▪"
        sev = ""
        if text == 0 and (control > 0 or invalid > 0):
            if s.nontext_streak >= MAX_NON_TEXT_STREAK - 8:
                sev = "☠"
            elif s.nontext_streak >= MAX_NON_TEXT_STREAK // 2:
                sev = "⚠"
        self._monitor(sid, sym + sev)

    def _restart(self, s: _Slot, sid: int, *, full: bool,
                 trigger: str | None = None):
        s.restarts += 1
        if not s.text_since_restart:
            s.empty_restarts += 1
        full = full or s.empty_restarts >= EMPTY_RESTARTS_FOR_FULL_RESET
        if self._monitor is not None and trigger is not None:
            self._monitor(sid, {"eos": "↺", "kv": "⟳", "streak": "↯",
                                "full": "⌚"}[trigger]
                          + ("♻" if full else "✂"))
        # un-stage: chunks already cut for FUTURE steps were cut under
        # pre-restart assumptions (forced rows, audio continuity for full
        # resets) — push their samples back (newest generation first so
        # chronological order is restored) and mask/discard their rows;
        # they are re-cut after the reset, restoring the serial order of
        # events. A generation already DISPATCHED (pipeline_steps > 1)
        # cannot be edited on the device: its tokens for this stream are
        # dropped at retire and the queued reset erases its state writes.
        gens = list(self._dispatched)
        if self._staged_next is not None:
            gens.append(self._staged_next)
        for g in reversed(gens):
            if sid not in g.raw:
                continue
            s.buf = np.concatenate([g.raw.pop(sid), s.buf])
            if g.out is not None:          # dispatched: discard at retire
                g.discard.add(sid)
                continue
            g.active[sid] = False
            g.part.remove(sid)
            g.forced[sid] = -1
            g.dirty = True       # wire already uploaded: re-pack at
            # dispatch (poll) so the device sees the edited rows
            if not g.part and self._n_procs == 1:
                # multi-host keeps an empty-part staged: the step is
                # GLOBAL (other hosts' rows may participate), and nulling
                # on one host only would desync the agreed collective
                # call sequence across processes
                self._staged_next = None
        self._queue_reset(sid, full=full)
        s.replay_left = self.prompt_len - 1
        s.pos = 0
        s.nontext_streak = 0
        if s.sdec is not None:       # drop any dangling partial character
            s.sdec = self.tok.stream_decoder()
        s.samples_since_text = 0     # restart the watchdog clock too
        # (voxtral.c:1237) — else a silent stream full-restarts forever
        s.text_since_restart = False
        if full:
            s.empty_restarts = 0
            s.buf = np.concatenate(
                [np.zeros(self.left_pad, np.float32), s.buf])

    def _alts(self, vals, idxs, best_logit):
        """Alternatives within 1 - p_i/p_best <= cutoff — exact full-vocab
        scan semantics (voxtral.c:955-1010) via the device-side
        alt_candidates top-k + the shared host cutoff walk."""
        return [(j, self.tok.decode([j]) if self.tok else None)
                for j in select_alts(best_logit, vals, idxs,
                                     self.n_alt, self.alt_cutoff)]

    def _consume(self, sid: int, toks: np.ndarray, forced: np.ndarray,
                 alt_info=None):
        cfg = self.cfg
        s = self.slots[sid]
        n_special = cfg.streaming.n_special
        eos = cfg.streaming.eos
        restart = None
        replay_used = 0
        n_text = n_control = n_invalid = n_steps = 0
        eos_step = False
        for i, t in enumerate(toks):
            t = int(t)
            if forced[i] >= 0:
                replay_used += 1
                continue
            if t < 0:
                continue
            if s.token_limit is not None and s.generated >= s.token_limit:
                continue               # final chunk's fill padding
            s.generated += 1
            s.all_ids.append(t)
            s.pos += 1
            n_steps += 1
            if t == eos:
                restart = restart or "eos"
                s.nontext_streak += 1
                eos_step = True
            elif t >= n_special:
                if self.tok is not None and not self.tok.token_bytes(t):
                    # reference STREAM_TOK_INVALID (voxtral.c:524-539): an
                    # empty decode is never enqueued and counts toward the
                    # non-text streak
                    s.nontext_streak += 1
                    n_invalid += 1
                    continue
                piece = s.sdec.piece(t) if s.sdec else None
                if alt_info is not None:
                    s.queue.append((t, piece, self._alts(
                        alt_info[0][i], alt_info[1][i], alt_info[2][i])))
                else:
                    s.queue.append((t, piece))
                s.text_tokens += 1
                s.nontext_streak = 0
                s.samples_since_text = 0
                s.text_since_restart = True
                n_text += 1
            else:
                s.nontext_streak += 1
                n_control += 1
        s.pos += replay_used
        if n_steps and self._monitor is not None:
            self._mon_decode(sid, s, n_steps, n_text, n_control, n_invalid,
                             eos_step)
        s.replay_left -= replay_used
        in_flight = sid in self._inflight_sids
        if not self.continuous:
            if restart == "eos":
                # the device-side `done` flag (stop_at_eos=True) already
                # froze the slot; record it so callers can observe the stop
                s.eos_seen = True
            if s.finishing and len(s.buf) < self.chunk_samp and not in_flight:
                self._finish_slot(s)
            return
        if s.pos > MAX_DECODE_KV:
            restart = restart or "kv"
        if s.nontext_streak >= MAX_NON_TEXT_STREAK:
            restart = restart or "streak"
        no_text_s = s.samples_since_text / cfg.audio.sample_rate
        if no_text_s > MAX_NO_TEXT_SECONDS:
            restart = "full"
        if restart and not s.finishing:
            # triggers >= 2 (kv / streak / timeout) are FULL resets in the
            # reference (voxtral.c:1210-1213); only EOS is decoder-only
            self._restart(s, sid, full=(restart != "eos"), trigger=restart)
            in_flight = False          # _restart un-stages the slot
        if s.finishing and len(s.buf) < self.chunk_samp and not in_flight:
            self._finish_slot(s)

    def _finish_slot(self, s: _Slot):
        s.finished = True
        if s.sdec is not None:
            rem = s.sdec.flush()       # stream ended mid-character
            if rem:
                s.queue.append((-1, rem))

    def retained_kv(self, sid: int) -> int:
        """In-window decode-KV entries slot `sid` actually holds on device
        — the checkable lockstep-lag bound (models/decoder.py:
        retained_window): equal to min(pos, window, ring) for a stream that
        participates in every step; smaller for a laggard whose oldest
        slots the shared cursor recycled. The watchdog's MAX_DECODE_KV
        restart keeps any shrink bounded; tests pin both behaviors."""
        from voxtral_tpu.models.decoder import retained_window
        dec = self.state.decode
        ring = dec.k_ring[0].shape[1] - dec.pending_sp.shape[1]
        window = min(self.cfg.decoder.window, ring)
        return int(self._fetch(retained_window(dec, window))[sid])

    def stats(self) -> dict:
        from voxtral_tpu.utils import device_memory_gb
        return {
            "steps": self.steps,
            "step_ms_total": round(self.step_ms_total, 1),
            "streams": sum(s.active for s in self.slots),
            "generated": sum(s.generated for s in self.slots),
            "text_tokens": sum(s.text_tokens for s in self.slots),
            "restarts": sum(s.restarts for s in self.slots),
            **device_memory_gb(),
        }

    def close(self):
        """Release the TP mesh context (no-op for single-device managers)."""
        if self._mesh_cm is not None:
            self._mesh_cm.__exit__(None, None, None)
            self._mesh_cm = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
