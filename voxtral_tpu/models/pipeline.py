"""Offline (batch) transcription pipeline: audio -> greedy token ids.

Mirrors the ground-truth schedule exactly (python_simple_implementation.py:
725-861): streaming-format padding, mel (drop-odd-frame), batch encoder,
adapter, 39-token prompt (BOS + STREAMING_PAD*38), prefill of 38 positions,
then greedy decode within the audio span with EOS stop.

The whole model runs as ONE jitted program per audio length; the decode loop
is a lax.scan so no host round-trip per token.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.audio.mel import batch_log_mel, pad_audio_offline
from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.models.adapter import adapter_forward
from voxtral_tpu.models.decoder import (
    ada_scales, decode_scan, decoder_prefill, init_decode_state,
    time_conditioning,
)
from voxtral_tpu.models.encoder import conv_stem, encoder_forward
from voxtral_tpu.ops.linear import embed_lookup


def prompt_token_ids(cfg: VoxtralConfig, delay_tokens: int) -> np.ndarray:
    st = cfg.streaming
    ids = [st.bos] + [st.streaming_pad] * (st.n_left_pad_tokens + delay_tokens)
    return np.asarray(ids, dtype=np.int32)


from voxtral_tpu.parallel.sharding import tp_scoped_jit


@partial(tp_scoped_jit, static_argnames=("cfg", "delay_tokens", "collect_topk"))
def _pipeline_jit(params, cfg: VoxtralConfig, mel, delay_tokens: int,
                  collect_topk: int = 0):
    """mel: [mel_bins, F] (F even). Returns (tokens [N], aux)."""
    h = conv_stem(params["encoder"], mel)
    trunc = h.shape[0] % cfg.downsample
    if trunc:
        h = h[trunc:]
    h = h.astype(cfg.compute_dtype)
    enc = encoder_forward(params["encoder"], cfg, h)
    adapter = adapter_forward(params["adapter"], cfg, enc)   # [n_audio, D]

    prompt = jnp.asarray(prompt_token_ids(cfg, delay_tokens))
    lp = prompt.shape[0]
    t_cond = time_conditioning(delay_tokens, cfg.decoder.dim)
    t_ada = ada_scales(params["decoder"], t_cond)

    embed = params["decoder"]["embed"]
    prefix = (adapter[:lp - 1].astype(jnp.float32)
              + embed_lookup(embed, prompt[:lp - 1]))
    state = init_decode_state(cfg, batch=1)
    state = decoder_prefill(params["decoder"], cfg, state,
                            prefix[None], t_ada)
    state = state._replace(prev_token=jnp.asarray([prompt[lp - 1]], jnp.int32))

    frames = adapter[lp - 1:]
    n = frames.shape[0]
    state, tokens, aux = decode_scan(
        params["decoder"], cfg, state, frames[None],
        jnp.asarray([n], jnp.int32), t_ada, collect_topk=collect_topk)
    return tokens[0], aux


def transcribe_tokens_batch(params, cfg: VoxtralConfig, audio: np.ndarray,
                            delay_tokens: int | None = None,
                            collect_topk: int = 0):
    """audio: [N] float32 @16 kHz. Returns (token_ids list[int] (EOS removed),
    aux dict). Token ids include control tokens, as in the reference's raw
    `generated` list."""
    if delay_tokens is None:
        delay_tokens = cfg.streaming.delay_tokens
    padded = pad_audio_offline(audio, cfg.audio, cfg.streaming,
                               delay_tokens=delay_tokens)
    mel = batch_log_mel(padded, cfg.audio)
    if mel.shape[1] % 2:
        mel = mel[:, 1:]
    tokens, aux = _pipeline_jit(params, cfg, jnp.asarray(mel), delay_tokens,
                                collect_topk)
    tokens = np.asarray(jax.device_get(tokens))
    out = []
    for t in tokens:
        if t < 0:
            break
        out.append(int(t))
        if t == cfg.streaming.eos:
            break
    if out and out[-1] == cfg.streaming.eos:
        out = out[:-1]
    return out, aux
