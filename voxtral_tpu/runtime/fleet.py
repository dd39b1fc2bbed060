"""Fleet step: the production multi-stream hot path.

One jitted program advances B concurrent streams by one fixed-size audio
chunk: batched conv stem (tail-carried) -> batched ring-cache encoder ->
adapter -> scan decode of the chunk's tokens. Fixed shapes everywhere; the
same compiled step runs forever.

Why this exists: at bf16 the 4B decoder is HBM-bandwidth-bound (~9 GB of
weights per token step), capping a single stream near 10x real-time on one
chip. Batching B streams through one step amortizes every weight read B
ways — this is the TPU answer to the reference's single-stream-per-process
design (voxtral.c:1242) and the source of the >=50x/chip headline.

Chunk contract: T mel frames per stream per step, T % 8 == 0 (so conv
stride, 4x downsample, and token counts stay aligned with no residuals:
T mel -> T conv0 -> T/2 encoder positions -> T/8 decoder tokens). The
ragged/unaligned general case lives in runtime/stream.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.models.adapter import adapter_forward
from voxtral_tpu.models.decoder import (
    DecodeState, decode_scan, decoder_prefill, init_decode_state,
)
from voxtral_tpu.models.encoder import (
    EncoderState, encoder_incremental, init_encoder_state,
)
from voxtral_tpu.ops.linear import embed_lookup
from voxtral_tpu.parallel.sharding import tp_scoped_jit


class FleetState(NamedTuple):
    pcm_tail: jax.Array    # [B, window-hop=240] f32 (device-mel path)
    mel_tail: jax.Array    # [B, mel_bins, 2]
    conv0_tail: jax.Array  # [B, enc_dim, 2]
    encoder: EncoderState  # batched
    decode: DecodeState    # batched


def init_fleet_state(cfg: VoxtralConfig, batch: int, *, enc_ring: int = 1280,
                     dec_ring: int | None = None, dtype=None,
                     max_mel_chunk: int = 320,
                     kv_dtype: str = "float",
                     enc_kv_dtype: str | None = None) -> FleetState:
    """max_mel_chunk: the largest mel chunk any step will see (including
    bootstrap) — it sizes the pending KV blocks (mel/2 encoder positions,
    mel/8 decoder tokens). Folding stays exact as long as the pending fits
    the ring's out-of-window margin (see models/decoder.py).

    kv_dtype="int8": quantized KV rings (halved HBM footprint + attention
    traffic; see models/decoder.py docstring). enc_kv_dtype overrides the
    ENCODER rings separately — "int4" packs them to nibbles (the largest
    per-stream state item, unpacked once per chunk; see models/encoder.py),
    which buys the bf16 fleet extra streams on a 16 GB chip."""
    dt = dtype or cfg.compute_dtype
    e, d = cfg.encoder, cfg.decoder
    dec = init_decode_state(cfg, batch=batch, dtype=dt,
                            ring_size=dec_ring,
                            pending_size=max_mel_chunk // 8,
                            kv_dtype=kv_dtype)
    return FleetState(
        pcm_tail=jnp.zeros(
            (batch, cfg.audio.window_size - cfg.audio.hop_length),
            jnp.float32),
        mel_tail=jnp.zeros((batch, cfg.audio.mel_bins, 2), jnp.float32),
        conv0_tail=jnp.zeros((batch, e.dim, 2), jnp.float32),
        encoder=init_encoder_state(cfg, ring_size=enc_ring, batch=batch,
                                   dtype=dt,
                                   pending_size=max_mel_chunk // 2,
                                   kv_dtype=enc_kv_dtype or kv_dtype),
        decode=dec,
    )


def _batched_causal_conv(x, w, b, stride, discard):
    """x: [B, C_in, 2+T] (tail included) -> [B, C_out, T'] with the first
    `discard` outputs (zero-pad contaminated) dropped, + exact GELU."""
    left = w.shape[0] - stride
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride,), padding=[(left, 0)],
        dimension_numbers=("NCH", "HIO", "NCH"),
        preferred_element_type=jnp.float32)
    y = y + b.astype(jnp.float32)[None, :, None]
    return jax.nn.gelu(y, approximate=False)[:, :, discard:]


def _conv_stem_with_tails(cfg, enc_p, state: FleetState, mel):
    """Tail-carried conv stem shared by every fleet entry point:
    mel [B, mel_bins, T] -> (h [B, T/2, D], conv0 activations y)."""
    x0 = jnp.concatenate([state.mel_tail, mel], axis=2)
    y = _batched_causal_conv(x0, enc_p["conv0_w"], enc_p["conv0_b"], 1, 2)
    x1 = jnp.concatenate([state.conv0_tail, y], axis=2)
    c = _batched_causal_conv(x1, enc_p["conv1_w"], enc_p["conv1_b"], 2, 1)
    return jnp.swapaxes(c, 1, 2).astype(cfg.compute_dtype), y


def _fleet_step_inner(params, cfg: VoxtralConfig, state: FleetState,
                      mel: jax.Array, t_ada: jax.Array, *,
                      stop_at_eos: bool = False, collect_topk: int = 0):
    b, _, t = mel.shape
    assert t % 8 == 0, t
    enc_p = params["encoder"]
    h, y = _conv_stem_with_tails(cfg, enc_p, state, mel)     # [B, T/2, D]

    enc_state, enc_out = encoder_incremental(enc_p, cfg, state.encoder, h)
    frames = jax.vmap(lambda e: adapter_forward(params["adapter"], cfg, e))(
        enc_out)                                             # [B, T/8, Dd]

    n = t // 8
    dec, tokens, aux = decode_scan(
        params["decoder"], cfg, state.decode, frames,
        jnp.full((b,), n, jnp.int32), t_ada,
        collect_topk=collect_topk, stop_at_eos=stop_at_eos)

    new_state = FleetState(
        pcm_tail=state.pcm_tail,
        mel_tail=mel[:, :, -2:],
        conv0_tail=y[:, :, -2:],
        encoder=enc_state,
        decode=dec)
    return new_state, tokens, aux


def _fleet_bootstrap_inner(params, cfg: VoxtralConfig, state: FleetState,
                           mel: jax.Array, t_ada: jax.Array, *,
                           stop_at_eos: bool = False):
    """First chunk of a fresh fleet: encode mel [B, mel_bins, T0]
    (T0 >= 8 * prompt_len, T0 % 8 == 0), prefill the 39-token prompt on the
    first frames, then decode the remainder. Returns (state, tokens
    [B, T0//8 - (prompt_len-1)], aux)."""
    b, _, t = mel.shape
    lp = cfg.streaming.prompt_len
    assert t % 8 == 0 and t // 8 >= lp, (t, lp)
    enc_p = params["encoder"]
    h, y = _conv_stem_with_tails(cfg, enc_p, state, mel)

    # The bootstrap chunk (>= 39-token prompt = 312 mel) is bigger than a
    # steady-state chunk; run the encoder in pending-capacity-sized
    # sub-chunks INSIDE this program so the pending block (and with it the
    # per-chunk quantize+fold cost and the ring size) stays sized for the
    # steady chunk, not for the bootstrap (the fold was measured at ~44% of
    # the encoder chunk cost at pending 160 — see SPEED.md).
    sp_cap = state.encoder.pending_sp.shape[1]
    enc_state, outs = state.encoder, []
    for s0 in range(0, h.shape[1], sp_cap):
        enc_state, o = encoder_incremental(enc_p, cfg, enc_state,
                                           h[:, s0:s0 + sp_cap])
        outs.append(o)
    enc_out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    frames = jax.vmap(lambda e: adapter_forward(params["adapter"], cfg, e))(
        enc_out)
    st = cfg.streaming
    prompt = jnp.asarray([st.bos] + [st.streaming_pad] * (lp - 1), jnp.int32)
    embed = params["decoder"]["embed"]
    prefix = (frames[:, :lp - 1].astype(jnp.float32)
              + embed_lookup(embed, prompt[:-1])[None])
    dec = decoder_prefill(params["decoder"], cfg, state.decode, prefix, t_ada)
    dec = dec._replace(prev_token=jnp.full((b,), prompt[-1], jnp.int32),
                       done=jnp.zeros((b,), bool))
    rest = frames[:, lp - 1:]
    n = rest.shape[1]
    dec, tokens, aux = decode_scan(
        params["decoder"], cfg, dec, rest, jnp.full((b,), n, jnp.int32),
        t_ada, stop_at_eos=stop_at_eos)
    new_state = FleetState(pcm_tail=state.pcm_tail, mel_tail=mel[:, :, -2:],
                           conv0_tail=y[:, :, -2:],
                           encoder=enc_state, decode=dec)
    return new_state, tokens, aux


@partial(tp_scoped_jit, static_argnames=("cfg", "stop_at_eos", "collect_topk"),
         donate_argnums=(2,))
def fleet_step(params, cfg: VoxtralConfig, state: FleetState,
               mel: jax.Array, t_ada: jax.Array, *,
               stop_at_eos: bool = False, collect_topk: int = 0):
    """mel: [B, mel_bins, T] (T % 8 == 0). Returns (state, tokens [B, T//8],
    aux). See fleet_step_pcm for the raw-audio (device-mel) variant."""
    return _fleet_step_inner(params, cfg, state, mel, t_ada,
                             stop_at_eos=stop_at_eos,
                             collect_topk=collect_topk)


@partial(tp_scoped_jit, static_argnames=("cfg", "stop_at_eos"),
         donate_argnums=(2,))
def fleet_bootstrap(params, cfg: VoxtralConfig, state: FleetState,
                    mel: jax.Array, t_ada: jax.Array, *,
                    stop_at_eos: bool = False):
    return _fleet_bootstrap_inner(params, cfg, state, mel, t_ada,
                                  stop_at_eos=stop_at_eos)


@partial(tp_scoped_jit, static_argnames=("cfg",), donate_argnums=(2,))
def fleet_prefill(params, cfg: VoxtralConfig, state: FleetState,
                  frames: jax.Array, prompt_ids: jax.Array,
                  t_ada: jax.Array) -> FleetState:
    """Batched prompt prefill: frames [B, P-1, Dd], prompt_ids [P]."""
    embed = params["decoder"]["embed"]
    prefix = (frames.astype(jnp.float32)
              + embed_lookup(embed, prompt_ids[:-1])[None])
    dec = decoder_prefill(params["decoder"], cfg, state.decode, prefix, t_ada)
    b = frames.shape[0]
    dec = dec._replace(
        prev_token=jnp.full((b,), prompt_ids[-1], jnp.int32),
        done=jnp.zeros((b,), bool))
    return state._replace(decode=dec)


# ---------------------------------------------------------------------------
# Device-side mel: raw PCM in, log-mel on the MXU (3 matmuls)
# ---------------------------------------------------------------------------

def pcm_stream_skew(cfg: VoxtralConfig) -> int:
    """The PCM fleet path consumes the PADDED sample stream minus its first
    (window - hop) - window//2 = 40 samples (always zeros: the left pad is
    32 tokens of silence). The zero pcm_tail then stands in for exactly the
    200-sample reflect pad, and device frame t covers the same samples as
    batch_log_mel frame t: [t*hop - 200, t*hop + 200) in padded coords."""
    a = cfg.audio
    return (a.window_size - a.hop_length) - a.window_size // 2


def pcm_stream(padded: "np.ndarray", cfg: VoxtralConfig):
    """Padded audio (pad_audio_offline output) -> the stream to feed
    fleet_*_pcm. Drops the zero skew prefix (see pcm_stream_skew)."""
    return padded[..., pcm_stream_skew(cfg):]


def _device_log_mel(cfg: VoxtralConfig, pcm_tail: jax.Array, pcm: jax.Array):
    """pcm_tail: [B, window-hop], pcm: [B, T*hop] -> (mel [B, mel_bins, T],
    new_tail). Frame t covers concat(tail, pcm)[t*hop : t*hop+window] —
    identical math to audio/mel.py:batch_log_mel (windowed framing + DFT as
    matmul + Slaney filters), which the reference also uses (precomputed
    DFT tables, voxtral_audio.c:338-347). On TPU these are three small
    MXU matmuls per chunk; the host never touches mel."""
    import numpy as np

    from voxtral_tpu.audio.mel import dft_matrices, hann_window, mel_filters
    a = cfg.audio
    b, n = pcm.shape
    t = n // a.hop_length
    x = jnp.concatenate([pcm_tail, pcm], axis=1)         # [B, lap + T*hop]
    idx = (a.hop_length * np.arange(t)[:, None]
           + np.arange(a.window_size)[None, :])          # [T, window]
    frames = x[:, idx] * jnp.asarray(hann_window(a.window_size))[None, None]
    cosm, sinm = dft_matrices(a)
    re = frames @ jnp.asarray(cosm)                      # [B, T, freq]
    im = frames @ jnp.asarray(sinm)
    power = re * re + im * im
    mel = power @ jnp.asarray(mel_filters(a))            # [B, T, mel]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, a.log_mel_max - 8.0)
    mel_out = jnp.swapaxes((log_spec + 4.0) / 4.0, 1, 2) # [B, mel, T]
    lap = a.window_size - a.hop_length
    return mel_out.astype(jnp.float32), x[:, -lap:]


@partial(tp_scoped_jit, static_argnames=("cfg", "stop_at_eos", "collect_topk"),
         donate_argnums=(2,))
def fleet_step_pcm(params, cfg: VoxtralConfig, state: FleetState,
                   pcm: jax.Array, t_ada: jax.Array, *,
                   stop_at_eos: bool = False, collect_topk: int = 0):
    """End-to-end step from raw audio: pcm [B, T*160] f32 (T % 8 == 0 mel
    frames worth of samples). The stream's padding contract is the host's:
    feed left-pad zeros first (the initial zero pcm_tail covers the
    200-sample reflect pad, since the padded stream starts with silence),
    and right-pad + reflection on finish (see runtime/manager.py)."""
    mel, tail = _device_log_mel(cfg, state.pcm_tail, pcm)
    state = state._replace(pcm_tail=tail)
    new_state, tokens, aux = _fleet_step_inner(
        params, cfg, state, mel, t_ada, stop_at_eos=stop_at_eos,
        collect_topk=collect_topk)
    return new_state, tokens, aux


@partial(tp_scoped_jit, static_argnames=("cfg", "stop_at_eos"),
         donate_argnums=(2,))
def fleet_bootstrap_pcm(params, cfg: VoxtralConfig, state: FleetState,
                        pcm: jax.Array, t_ada: jax.Array, *,
                        stop_at_eos: bool = False):
    mel, tail = _device_log_mel(cfg, state.pcm_tail, pcm)
    state = state._replace(pcm_tail=tail)
    return _fleet_bootstrap_inner(params, cfg, state, mel, t_ada,
                                  stop_at_eos=stop_at_eos)


def pack_wire(pcm: "np.ndarray", active: "np.ndarray",
              forced: "np.ndarray") -> "np.ndarray":
    """Host-side single-upload wire row: [pcm | active | forced] per
    stream. On a high-fixed-cost link every host->device transfer costs
    ~25 ms regardless of size (SPEED.md serving-latency breakdown), so the
    manager ships ONE array per step instead of three.

    f32 wire: active as 0/1, forced as exact float ints (|id| < 2^24).
    s16 wire: active as 0/1, forced split lo/hi int16 halves."""
    import numpy as np

    if pcm.dtype == np.int16:
        lo = (forced & 0xffff).astype(np.int16)
        hi = (forced >> 16).astype(np.int16)
        return np.concatenate(
            [pcm, active[:, None].astype(np.int16), lo, hi], axis=1)
    return np.concatenate(
        [pcm, active[:, None].astype(np.float32),
         forced.astype(np.float32)], axis=1)


def _unpack_wire(cfg: VoxtralConfig, wire: jax.Array):
    """Inverse of pack_wire, on device (exact)."""
    hop = cfg.audio.hop_length
    s16 = wire.dtype == jnp.int16
    b, w = wire.shape
    # w = n*8*hop + 1 + n (f32) or n*8*hop + 1 + 2n (s16)
    n = (w - 1) // (8 * hop + (2 if s16 else 1))
    n_samp = n * 8 * hop
    pcm = wire[:, :n_samp]
    active = wire[:, n_samp] != 0
    rest = wire[:, n_samp + 1:]
    if s16:
        lo = rest[:, :n].astype(jnp.int32)
        hi = rest[:, n:].astype(jnp.int32)
        forced = (hi << 16) | (lo & 0xffff)
    else:
        forced = rest.astype(jnp.int32)
    return pcm, active, forced


@partial(tp_scoped_jit, static_argnames=("cfg", "stop_at_eos", "collect_topk",
                                   "wire_packed"),
         donate_argnums=(2,))
def fleet_step_masked(params, cfg: VoxtralConfig, state: FleetState,
                      pcm: jax.Array, active: jax.Array,
                      forced_tokens: jax.Array, t_ada: jax.Array, *,
                      stop_at_eos: bool = False, collect_topk: int = 0,
                      wire_packed: bool = False):
    """Serving step with per-stream participation (runtime/manager.py).

    pcm: [B, T*hop] (rows of inactive streams are ignored zeros);
    active: [B] bool — full-chunk-or-nothing per stream: an inactive
    stream's tails/cursors/rings are untouched this step (its ring slots
    may still recycle under the shared lockstep cursor — the documented
    lag caveat, bounded by the watchdog restarts);
    forced_tokens: [B, T//8] int32, >= 0 forces the emitted/fed-back token
    (prompt replay for per-stream starts and watchdog restarts —
    the reference's stream_reset + re-prefill, voxtral.c:778-824, done
    here as forced-token decode so ONE program serves every stream state).

    wire_packed: pcm is a pack_wire row block carrying active/forced too
    (single upload); the active/forced args are ignored placeholders.
    """
    if wire_packed:
        pcm, active, forced_tokens = _unpack_wire(cfg, pcm)
    b, n_samp = pcm.shape
    t = n_samp // cfg.audio.hop_length
    n = t // 8
    if pcm.dtype == jnp.int16:
        # s16 wire format (manager wire_dtype="s16"): native WAV/mic sample
        # format, half the host->device bytes; the conversion is exact
        # (int16 -> f32 lossless, *2^-15 scales the exponent only)
        pcm = pcm.astype(jnp.float32) * (1.0 / 32768.0)
    mel, new_tail = _device_log_mel(cfg, state.pcm_tail, pcm)
    act_col = active[:, None]
    pcm_tail = jnp.where(act_col, new_tail, state.pcm_tail)

    enc_p = params["encoder"]
    h, y = _conv_stem_with_tails(cfg, enc_p, state, mel)
    mel_tail = jnp.where(act_col[:, :, None], mel[:, :, -2:], state.mel_tail)
    conv0_tail = jnp.where(act_col[:, :, None], y[:, :, -2:],
                           state.conv0_tail)

    n_enc = jnp.where(active, t // 2, 0).astype(jnp.int32)
    enc_state, enc_out = encoder_incremental(enc_p, cfg, state.encoder, h,
                                             n_valid=n_enc)
    frames = jax.vmap(lambda e: adapter_forward(params["adapter"], cfg, e))(
        enc_out)

    n_dec = jnp.where(active, n, 0).astype(jnp.int32)
    dec, tokens, aux = decode_scan(
        params["decoder"], cfg, state.decode, frames, n_dec, t_ada,
        collect_topk=collect_topk, stop_at_eos=stop_at_eos,
        forced_tokens=forced_tokens)

    new_state = FleetState(pcm_tail=pcm_tail, mel_tail=mel_tail,
                           conv0_tail=conv0_tail, encoder=enc_state,
                           decode=dec)
    return new_state, tokens, aux


def age_fleet_state(cfg: VoxtralConfig, state: FleetState,
                    decoder_positions: int) -> FleetState:
    """Fleet state as if every stream had already processed
    `decoder_positions` decode positions (4x that many encoder positions),
    far enough that both rings have wrapped: every slot holds a valid
    logical position, so the prefix-bucketed attention reads the WHOLE ring.

    Benchmarking/profiling helper: ring contents stay zeros (attention cost
    depends on validity masks, not values), so this reproduces the
    steady-state cost of a long-running stream without feeding minutes of
    audio. A fresh fleet reaches this state naturally once a stream's
    context passes the ring size (dec ring 2048 ~= 164 s of audio)."""
    import numpy as np

    def age(s, pos0, next_field, extra):
        phys = s.slot_pos.shape[1]
        np_ = s.pending_sp.shape[1]
        ring = phys - np_
        assert pos0 >= phys, (pos0, phys)
        b = s.slot_pos.shape[0]
        j = np.arange(phys)
        # slot j holds position p ≡ j (mod ring), p in [pos0 - ring, pos0);
        # overflow slots keep their pre-wrap (older, out-of-window) entries
        p = pos0 - ring + (j - pos0 % ring) % ring
        p[ring:] -= ring
        return s._replace(
            slot_pos=jnp.asarray(np.tile(p, (b, 1)), jnp.int32),
            write_ctr=jnp.int32(pos0),
            pending_sp=jnp.full_like(s.pending_sp, -(1 << 30)),
            pending_adv=jnp.zeros((), jnp.int32),
            **{next_field: jnp.full((b,), pos0, jnp.int32)}, **extra)

    b = state.decode.pos.shape[0]
    enc = age(state.encoder, decoder_positions * 4, "next_pos", {})
    dec = age(state.decode, decoder_positions, "pos",
              dict(prev_token=jnp.full((b,), 1000, jnp.int32)))
    return state._replace(encoder=enc, decode=dec)


@partial(tp_scoped_jit, static_argnames=("cfg", "full"), donate_argnums=(1,))
def fleet_reset_slots(cfg: VoxtralConfig, state: FleetState,
                      mask: jax.Array, *, full: bool) -> FleetState:
    """Per-slot reset inside a live fleet (attach / watchdog restart).
    Decoder-only unless full (which also clears the audio-side state —
    the reference's two-tier escalation, voxtral.c:797-824)."""
    from voxtral_tpu.models.decoder import reset_streams
    from voxtral_tpu.models.encoder import reset_encoder_streams
    dec = reset_streams(state.decode, mask, cfg.streaming.bos)
    if not full:
        return state._replace(decode=dec)
    m = mask[:, None]
    return state._replace(
        decode=dec,
        encoder=reset_encoder_streams(state.encoder, mask),
        pcm_tail=jnp.where(m, 0.0, state.pcm_tail),
        mel_tail=jnp.where(mask[:, None, None], 0.0, state.mel_tail),
        conv0_tail=jnp.where(mask[:, None, None], 0.0, state.conv0_tail))
