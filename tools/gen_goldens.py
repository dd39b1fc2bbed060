#!/usr/bin/env python3
"""Generate golden test fixtures by running the REFERENCE torch implementation
(/root/reference/python_simple_implementation.py — the ground truth the whole
framework must match token-for-token) on tiny random weights.

The reference module's architecture constants are monkeypatched down to
tiny_config() so fixtures are small and fast; the math paths exercised are
identical. Weights round-trip through our safetensors writer so the weight
I/O layer is validated too.

Run:  python tools/gen_goldens.py          (writes tests/fixtures/*.npz)
"""

import importlib.util
import os
import sys
import tempfile
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from voxtral_tpu.config import tiny_config  # noqa: E402
from voxtral_tpu.weights import (  # noqa: E402
    SafetensorsFile, params_to_safetensors, random_params,
)

REFERENCE = os.environ.get(
    "VOXTRAL_REFERENCE", "/root/reference") + "/python_simple_implementation.py"
FIXTURES = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def load_reference_module():
    # Stub out the reference's optional deps (we never call its file I/O).
    for name in ("safetensors", "soundfile", "soxr"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "safetensors":
                mod.safe_open = None
            sys.modules[name] = mod
    spec = importlib.util.spec_from_file_location("voxtral_reference", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class FakeSF:
    """Duck-typed stand-in for safetensors safe_open handles."""

    def __init__(self, path):
        import torch
        self._sf = SafetensorsFile(path)
        self._torch = torch

    def get_tensor(self, name):
        return self._torch.tensor(np.asarray(self._sf.tensor_f32(name)))


def patch_tiny(ref, cfg):
    e, d = cfg.encoder, cfg.decoder
    ref.ENC_DIM, ref.ENC_LAYERS, ref.ENC_HEADS = e.dim, e.layers, e.heads
    ref.ENC_HEAD_DIM, ref.ENC_HIDDEN, ref.ENC_KV_HEADS = e.head_dim, e.hidden, e.heads
    ref.ENC_WINDOW = e.window
    ref.DEC_DIM, ref.DEC_LAYERS, ref.DEC_HEADS = d.dim, d.layers, d.heads
    ref.DEC_HEAD_DIM, ref.DEC_HIDDEN, ref.DEC_KV_HEADS = d.head_dim, d.hidden, d.kv_heads
    ref.DEC_WINDOW = d.window
    ref.VOCAB_SIZE = d.vocab_size


def main():
    import torch
    torch.manual_seed(0)
    os.makedirs(FIXTURES, exist_ok=True)
    ref = load_reference_module()
    cfg = tiny_config()
    patch_tiny(ref, cfg)

    params = random_params(cfg, seed=1234)
    tmp = tempfile.NamedTemporaryFile(suffix=".safetensors", delete=False)
    tmp.close()
    params_to_safetensors(params, cfg, tmp.name)
    sf = FakeSF(tmp.name)

    rng = np.random.RandomState(7)

    # ---- 1. Mel goldens (full-size audio config) -------------------------
    audio = (rng.randn(8000) * 0.1).astype(np.float32)   # 0.5 s
    filters = ref.compute_mel_filters()
    mel_t = ref.compute_mel_spectrogram(
        torch.tensor(audio), torch.tensor(filters, dtype=torch.float32))
    padded = ref.pad_audio_streaming(audio).astype(np.float32)
    mel_padded_t = ref.compute_mel_spectrogram(
        torch.tensor(padded), torch.tensor(filters, dtype=torch.float32))
    np.savez(os.path.join(FIXTURES, "mel.npz"),
             audio=audio, filters=filters.astype(np.float32),
             mel=mel_t.numpy(), padded=padded, mel_padded=mel_padded_t.numpy())

    # ---- 2. Encoder + adapter goldens (tiny) -----------------------------
    f = 64
    mel_in = rng.rand(cfg.audio.mel_bins, f).astype(np.float32)
    with torch.no_grad():
        enc_out = ref.encoder_forward(torch.tensor(mel_in), None, sf)
        ada_out = ref.adapter_forward(enc_out, sf)
    np.savez(os.path.join(FIXTURES, "encoder.npz"),
             mel=mel_in, enc_out=enc_out.numpy(), adapter_out=ada_out.numpy())

    # ---- 3. Decoder goldens (tiny): prefill + stepped greedy decode ------
    n_audio = 60
    adapter = (rng.randn(n_audio, cfg.decoder.dim) * 0.5).astype(np.float32)
    delay = cfg.streaming.delay_tokens
    t_cond = ref.compute_time_embedding(float(delay), cfg.decoder.dim)
    prompt = [1] + [32] * (cfg.streaming.n_left_pad_tokens + delay)
    lp = len(prompt)
    dec = ref.Decoder(sf)
    ada_t = torch.tensor(adapter)
    with torch.no_grad():
        prefix = ada_t[:lp] + dec.embed_tokens(torch.tensor(prompt))
        dec.prefill(prefix[:-1], t_cond)
        logits = dec.forward_one(prefix[-1], pos=lp - 1, t_cond=t_cond)
        tokens = [int(logits.argmax())]
        all_logits = [logits.numpy().copy()]
        for pos in range(lp, n_audio):
            emb = ada_t[pos] + dec.embed_token(tokens[-1])
            logits = dec.forward_one(emb, pos=pos, t_cond=t_cond)
            tokens.append(int(logits.argmax()))
            all_logits.append(logits.numpy().copy())
    np.savez(os.path.join(FIXTURES, "decoder.npz"),
             adapter=adapter, t_cond=t_cond.numpy(),
             tokens=np.asarray(tokens, np.int32),
             logits=np.stack(all_logits))

    # ---- 4. Full tiny pipeline golden (audio -> tokens) ------------------
    audio2 = (rng.randn(8000) * 0.3).astype(np.float32)
    padded2 = ref.pad_audio_streaming(audio2).astype(np.float32)
    mel2 = ref.compute_mel_spectrogram(
        torch.tensor(padded2), torch.tensor(filters, dtype=torch.float32))
    if mel2.shape[1] % 2:
        mel2 = mel2[:, 1:]
    with torch.no_grad():
        enc2 = ref.encoder_forward(mel2, None, sf)
        ada2 = ref.adapter_forward(enc2, sf)
        dec2 = ref.Decoder(sf)
        n2 = ada2.shape[0]
        prefix2 = ada2[:lp] + dec2.embed_tokens(torch.tensor(prompt))
        dec2.prefill(prefix2[:-1], t_cond)
        lg = dec2.forward_one(prefix2[-1], pos=lp - 1, t_cond=t_cond)
        toks2 = [int(lg.argmax())]
        for pos in range(lp, n2):
            emb = ada2[pos] + dec2.embed_token(toks2[-1])
            lg = dec2.forward_one(emb, pos=pos, t_cond=t_cond)
            toks2.append(int(lg.argmax()))
    np.savez(os.path.join(FIXTURES, "pipeline.npz"),
             audio=audio2, tokens=np.asarray(toks2, np.int32))

    os.unlink(tmp.name)
    print(f"goldens written to {FIXTURES}")


if __name__ == "__main__":
    main()
