#!/usr/bin/env python3
"""Full-4B-shape parity vs the torch reference (no real weights available:
this is the sanctioned fallback — random bf16 weights at the REAL model
dimensions, so the hd=128 decode path, 26-layer accumulation drift, and the
131072-wide argmax all run at scale; tiny-config goldens can't exercise
those).

Protocol (mirrors the reference transcribe() schedule,
python_simple_implementation.py:725-861): random bf16 weights at full dims
round-trip through our safetensors writer into the torch reference (f32
compute), which produces greedy tokens for a short random-audio clip; our
batch pipeline must match token-for-token in f32 parity mode, and the
report records bf16 / Q8+int8-KV agreement for the serving configs.

Runs on CPU (forced): the torch side needs ~16 GB f32 weights.

Env: VOX_4B_SECONDS (default 2.0), VOX_4B_ENC_LAYERS / VOX_4B_DEC_LAYERS
(default full 32/26), VOX_4B_MODES (comma list of f32,bf16,q8 — default
all), VOX_4B_SEED.
Output: a PARITY_4B report block on stdout; non-zero exit if the f32 mode
diverges.
"""

import dataclasses
import importlib.util
import os
import sys
import tempfile
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from voxtral_tpu.config import voxtral_4b  # noqa: E402
from voxtral_tpu.weights import (  # noqa: E402
    SafetensorsFile, params_to_safetensors, random_params)

REFERENCE = os.environ.get(
    "VOXTRAL_REFERENCE",
    "/root/reference") + "/python_simple_implementation.py"


def log(m):
    print(m, file=sys.stderr, flush=True)


def load_reference_module():
    for name in ("safetensors", "soundfile", "soxr"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "safetensors":
                mod.safe_open = None
            sys.modules[name] = mod
    spec = importlib.util.spec_from_file_location("voxtral_reference",
                                                  REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class FakeSF:
    def __init__(self, path):
        import torch
        self._sf = SafetensorsFile(path)
        self._torch = torch

    def get_tensor(self, name):
        return self._torch.tensor(np.asarray(self._sf.tensor_f32(name)))


def patch_dims(ref, cfg):
    e, d = cfg.encoder, cfg.decoder
    ref.ENC_DIM, ref.ENC_LAYERS, ref.ENC_HEADS = e.dim, e.layers, e.heads
    ref.ENC_HEAD_DIM, ref.ENC_HIDDEN = e.head_dim, e.hidden
    ref.ENC_KV_HEADS, ref.ENC_WINDOW = e.heads, e.window
    ref.DEC_DIM, ref.DEC_LAYERS, ref.DEC_HEADS = d.dim, d.layers, d.heads
    ref.DEC_HEAD_DIM, ref.DEC_HIDDEN = d.head_dim, d.hidden
    ref.DEC_KV_HEADS, ref.DEC_WINDOW = d.kv_heads, d.window
    ref.VOCAB_SIZE = d.vocab_size


def reference_tokens(ref, sf, cfg, audio):
    """The reference transcribe() schedule on raw audio (f32 torch)."""
    import torch
    delay = cfg.streaming.delay_tokens
    filters = ref.compute_mel_filters()
    padded = ref.pad_audio_streaming(audio).astype(np.float32)
    mel = ref.compute_mel_spectrogram(
        torch.tensor(padded), torch.tensor(filters, dtype=torch.float32))
    if mel.shape[1] % 2:
        mel = mel[:, 1:]
    t0 = time.perf_counter()
    with torch.no_grad():
        enc = ref.encoder_forward(mel, None, sf)
        ada = ref.adapter_forward(enc, sf)
        log(f"  torch encoder+adapter: {time.perf_counter() - t0:.1f}s "
            f"({ada.shape[0]} positions)")
        t_cond = ref.compute_time_embedding(float(delay), cfg.decoder.dim)
        prompt = [cfg.streaming.bos] + [cfg.streaming.streaming_pad] * (
            cfg.streaming.n_left_pad_tokens + delay)
        lp = len(prompt)
        dec = ref.Decoder(sf)
        n = ada.shape[0]
        prefix = ada[:lp] + dec.embed_tokens(torch.tensor(prompt))
        t0 = time.perf_counter()
        dec.prefill(prefix[:-1], t_cond)
        lg = dec.forward_one(prefix[-1], pos=lp - 1, t_cond=t_cond)
        toks = [int(lg.argmax())]
        margins = []
        top2 = torch.topk(lg, 2).values
        margins.append(float(top2[0] - top2[1]))
        for pos in range(lp, n):
            if toks[-1] == cfg.streaming.eos:
                break
            emb = ada[pos] + dec.embed_token(toks[-1])
            lg = dec.forward_one(emb, pos=pos, t_cond=t_cond)
            toks.append(int(lg.argmax()))
            top2 = torch.topk(lg, 2).values
            margins.append(float(top2[0] - top2[1]))
        log(f"  torch decode ({len(toks)} steps): "
            f"{time.perf_counter() - t0:.1f}s")
    if toks and toks[-1] == cfg.streaming.eos:
        toks = toks[:-1]
        margins = margins[:-1]
    return toks, margins


def agreement(got, want, margins=None):
    n = min(len(got), len(want))
    same = sum(g == w for g, w in zip(got, want))
    first_div = next((i for i in range(n) if got[i] != want[i]), None)
    if first_div is None and len(got) != len(want):
        first_div = n
    r = {"got_len": len(got), "want_len": len(want), "matching": same,
         "first_divergence": first_div,
         "exact": got == want}
    if margins is not None and first_div is not None \
            and first_div < len(margins):
        # the reference's top-2 logit margin at the first flipped step:
        # a tiny value says the flip is a quantization near-tie, not a
        # state/machinery bug (state bugs flip wide-margin steps too)
        r["margin_at_divergence"] = float(margins[first_div])
    return r


def full_dim_config(enc_layers: int | None = None,
                    dec_layers: int | None = None,
                    dec_window: int | None = None):
    """dec_window shrinks the decoder attention window (torch side windows
    identically — patch_dims sets ref.DEC_WINDOW, the cache trim at
    python_simple_implementation.py:573-578) so a short clip can wrap the
    serving decode ring at full 4B dims (VERDICT r4 missing #4)."""
    cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    return dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder,
                                    layers=enc_layers or cfg.encoder.layers),
        decoder=dataclasses.replace(
            cfg.decoder,
            layers=dec_layers or cfg.decoder.layers,
            window=dec_window or cfg.decoder.window))


def run(cfg, seconds: float, modes, seed: int = 4242,
        dec_ring: int = 2048) -> dict:
    """Generate bf16 weights at cfg's dims, get reference greedy tokens via
    the torch implementation, run our pipeline in each mode, and return the
    agreement report (tests/test_parity_4b_dims.py calls this with reduced
    layer counts)."""
    import gc

    t0 = time.perf_counter()
    params = random_params(cfg, seed=seed)
    log(f"params (bf16, CPU): {time.perf_counter() - t0:.1f}s")
    tmp = tempfile.NamedTemporaryFile(suffix=".safetensors", delete=False)
    tmp.close()
    t0 = time.perf_counter()
    params_to_safetensors(params, cfg, tmp.name)
    log(f"safetensors write: {time.perf_counter() - t0:.1f}s")

    rng = np.random.RandomState(seed)
    audio = (rng.randn(int(16000 * seconds)) * 0.1).astype(np.float32)

    ref = load_reference_module()
    patch_dims(ref, cfg)
    sf = FakeSF(tmp.name)
    want, margins = reference_tokens(ref, sf, cfg, audio)
    m = np.asarray(margins) if margins else np.asarray([np.inf])
    log(f"reference: {len(want)} tokens, min top-2 logit margin "
        f"{m.min():.4g} (p10 {np.percentile(m, 10):.4g})")
    del sf
    gc.collect()

    from voxtral_tpu.models.pipeline import transcribe_tokens_batch
    report = {"tokens": len(want), "min_margin": float(m.min())}
    for mode in modes:
        mode = mode.strip()
        t0 = time.perf_counter()
        if mode == "f32":
            p = jax.tree.map(lambda x: x.astype(jnp.float32), params)
            c = cfg.with_dtype(jnp.float32)
        elif mode == "bf16":
            p, c = params, cfg
        elif mode == "q8":
            from voxtral_tpu.quant import quantize_params
            import copy
            p = quantize_params(copy.deepcopy(params))
            c = cfg
        elif mode in ("serving", "serving_int4", "serving_float"):
            # the PRODUCTION path end-to-end: the FleetManager serving
            # loop (device-side mel, masked step, scan decode, ring
            # folds). serving/serving_int4 = Q8 weights + int8 KV rings
            # (serving_int4 adds the round-4 nibble-packed ENCODER rings
            # — the bench default B=40): the quality proxy for the
            # benchmark headline. serving_float = f32 weights + float KV
            # rings: bit-parity mode for the ring STATE MACHINERY itself
            # (wrap + fold + logical-position masks + forced replay) at
            # real 4B dims, where quantization near-ties can't mask or
            # mimic a state bug — must match torch exactly even when
            # dec_ring wraps (the regime voxtral_decoder.c:354-384's
            # compaction covers; VERDICT r4 missing #4).
            import copy

            from voxtral_tpu.quant import quantize_params
            from voxtral_tpu.runtime.manager import FleetManager
            if mode == "serving_float":
                p = jax.tree.map(lambda x: x.astype(jnp.float32), params)
                c = cfg.with_dtype(jnp.float32)
                kv, enc_kv = "float", None
            else:
                p = quantize_params(copy.deepcopy(params))
                c = cfg
                kv = "int8"
                enc_kv = "int4" if mode.endswith("int4") else None
            # dec_ring < the token count makes the ring WRAP mid-clip
            with FleetManager(p, c, batch=1, chunk_tokens=8,
                              dec_ring=dec_ring, continuous=False,
                              kv_dtype=kv, enc_kv_dtype=enc_kv) as mgr:
                sid = mgr.attach()
                mgr.feed(sid, audio)
                mgr.finish(sid)
                while not mgr.is_finished(sid):
                    mgr.poll()
                got = [t for t in mgr.slots[sid].all_ids
                       if t != cfg.streaming.eos]
            del p
            gc.collect()
            r = agreement(got, want, margins)
            log(f"mode {mode}: {r} ({time.perf_counter() - t0:.1f}s)")
            report[mode] = r
            continue
        else:
            raise ValueError(mode)
        got, _ = transcribe_tokens_batch(p, c, audio)
        del p
        gc.collect()
        r = agreement(got, want)
        log(f"mode {mode}: {r} ({time.perf_counter() - t0:.1f}s)")
        report[mode] = r
    os.unlink(tmp.name)
    return report


def main():
    seconds = float(os.environ.get("VOX_4B_SECONDS", "2.0"))
    seed = int(os.environ.get("VOX_4B_SEED", "4242"))
    modes = os.environ.get("VOX_4B_MODES", "f32,bf16,q8").split(",")
    cfg = full_dim_config(
        int(os.environ["VOX_4B_ENC_LAYERS"])
        if "VOX_4B_ENC_LAYERS" in os.environ else None,
        int(os.environ["VOX_4B_DEC_LAYERS"])
        if "VOX_4B_DEC_LAYERS" in os.environ else None,
        int(os.environ["VOX_4B_DEC_WINDOW"])
        if "VOX_4B_DEC_WINDOW" in os.environ else None)
    dec_ring = int(os.environ.get("VOX_4B_DEC_RING", "2048"))
    log(f"config: enc {cfg.encoder.layers}L/{cfg.encoder.dim}, "
        f"dec {cfg.decoder.layers}L/{cfg.decoder.dim} "
        f"window {cfg.decoder.window} ring {dec_ring}, "
        f"vocab {cfg.decoder.vocab_size}, {seconds}s audio, seed {seed}")
    report = run(cfg, seconds, modes, seed, dec_ring=dec_ring)
    print("PARITY_4B", report)
    # the bit-parity modes must be exact; quantized modes report agreement
    sys.exit(0 if all(report.get(m, {}).get("exact", True)
                      for m in ("f32", "serving_float")) else 1)


if __name__ == "__main__":
    main()
